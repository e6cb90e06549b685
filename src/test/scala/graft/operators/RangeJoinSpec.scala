package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed point-in-interval equals the naive theta-join, pair for pair") {
    val ev = graft.analytics.Tables.events(spark, sf())
      .select($"event_id", $"ts")
    val windows = graft.analytics.Tables.events(spark, sf())
      .filter($"event_type" === "purchase")
      .orderBy("event_id").limit(100) // deterministic subset across evaluations
      .select($"event_id".as("p_id"),
        $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 1 DAY")).as("w_end"))
    val naive = ev.crossJoin(windows)
      .filter($"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select("event_id", "p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(ev, "ts", windows, "w_start", "w_end")
      .select("event_id", "p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test slice should produce matches")
    assert(bucketed == naive)
  }

  test("boundary semantics: both interval ends inclusive, single-bucket dedup-free") {
    val pts = Seq(
      (1L, "2024-01-01 00:00:00"), // == start
      (2L, "2024-01-04 00:00:00"), // == end
      (3L, "2024-01-04 00:00:01"), // just past end
      (4L, "2023-12-31 23:59:59")  // just before start
    ).toDF("pid", "ts").withColumn("ts", $"ts".cast("timestamp"))
    val iv = Seq((10L, "2024-01-01 00:00:00", "2024-01-04 00:00:00"))
      .toDF("iid", "w_start", "w_end")
      .withColumn("w_start", $"w_start".cast("timestamp"))
      .withColumn("w_end", $"w_end".cast("timestamp"))
    val out = RangeJoin.pointInInterval(pts, "ts", iv, "w_start", "w_end")
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
    // exactly one output row per matching pair (no bucket-induced dups)
    assert(RangeJoin.pointInInterval(pts, "ts", iv, "w_start", "w_end").count() == 2)
  }
}
