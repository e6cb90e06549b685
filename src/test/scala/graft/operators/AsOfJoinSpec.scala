package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:30"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3")
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // equal ts: inclusive match for t1
      (1L, ts("2024-01-01 10:00:20"), 102.0),
      (2L, ts("2024-01-01 10:00:15"), 200.0)  // AFTER t3 → no match
    ).toDF("key", "qts", "price")

    val out = AsOfJoin.backward(trades, quotes, "key", "ts", "qts",
        Map("price" -> "last_price", "qts" -> "last_quote_ts"))
      .orderBy("ts", "key")
      .collect()
      .map(r => r.getAs[String]("trade") ->
        Option(r.getAs[Any]("last_price")).map(_.asInstanceOf[Double])).toMap

    assert(out("t1").contains(101.0)) // inclusive equal-ts match
    assert(out("t2").contains(102.0)) // latest prior
    assert(out("t3").isEmpty)         // only future quotes exist for key 2
  }

  test("NULL fields in the matched right row are carried as NULL, not backfilled") {
    // Most recent quote for t1 has a NULL venue: the join must NOT substitute
    // the older quote's venue (rows are carried whole, as one struct).
    val trades = Seq((1L, ts("2024-01-01 10:00:30"), "t1")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some("NYSE")),
      (1L, ts("2024-01-01 10:00:20"), Some(102.0), None) // latest: venue NULL
    ).toDF("key", "qts", "price", "venue")

    val row = AsOfJoin.backward(trades, quotes, "key", "ts", "qts",
      Map("price" -> "last_price", "venue" -> "last_venue")).collect()(0)
    assert(row.getAs[Double]("last_price") == 102.0)
    assert(row.getAs[Any]("last_venue") == null) // NOT "NYSE"
  }

  test("all left rows survive (left-outer semantics)") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("key", "ts", "v")
    val right = spark.emptyDataset[(Long, Timestamp, Double)].toDF("key", "qts", "price")
    val out = AsOfJoin.backward(left, right, "key", "ts", "qts", Map("price" -> "p"))
    assert(out.count() == 1)
    assert(out.collect()(0).getAs[Any]("p") == null)
  }
}
