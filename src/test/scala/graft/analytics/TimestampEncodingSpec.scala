package graft.analytics

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Schema-variant canary: the driver's testdata generator has shipped
  * `events.ts` in (at least) three parquet encodings across rounds —
  * TIMESTAMP(NANOS) (which Spark 4 only reads as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`), `timestamp[us]` with
  * isAdjustedToUTC=false (read as TIMESTAMP_NTZ, whose cast-to-numeric
  * Spark 4 forbids), and `timestamp[us]` adjusted-to-UTC (plain TIMESTAMP).
  * The round-9 regen flipped ns→µs-NTZ and silently broke every
  * epoch-seconds-deriving query at analysis time.
  *
  * This spec writes the SAME tiny events table in all three encodings and
  * runs the epoch-seconds-sensitive query family over each: every variant
  * must analyze, execute, AND return bit-identical rows. An encoding flip
  * in driver testdata can never again break analysis silently.
  */
class TimestampEncodingSpec extends SparkSpec {

  // queries whose plans derive epoch seconds from events.ts
  private val family = Seq(
    "q_cdc_scd2", "q_cdc_scd2_asof", "q_cdc_scd2_stream",
    "q_cdc_compaction", "q_sessionize", "q_stream_dedup",
    "q_stream_interval_join")

  private lazy val dirs: Map[String, String] = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    // 3 users × 12 events spanning several days, sub-second jitter included
    // so truncation behavior is exercised; event types cover the
    // purchase/click split the interval join filters on.
    // base 2024-01-11, ~1h apart → every user's version chain straddles the
    // q_cdc_scd2_asof instant (2024-01-15) with a non-'error' open version
    // (i=11 → "view"), so the as-of reconstruction returns rows.
    val rows = for {
      u <- 1 to 3; i <- 0 until 12
    } yield (
      (u * 100 + i).toLong,                                 // event_id
      1705000000000000L + u * 997000000L + i * 3700123456L, // ts µs, >1h apart
      u.toLong,
      Seq("purchase", "click", "error", "view")(i % 4),
      i * 1.5,
      s"""{"i":$i}""")
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")

    val ltz = s"$base/ltz"; val ntz = s"$base/ntz"; val nsl = s"$base/nsl"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    df.select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$ltz/events.parquet")
    df.select(col("event_id"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$ntz/events.parquet")
    // TIMESTAMP(NANOS) surfaces in-session as a plain LongType column under
    // the legacy flag — writing the nano value as int64 exercises the
    // identical Tables.events code path without needing a nanos writer
    // (Spark cannot produce one).
    df.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$nsl/events.parquet")
    Map("us-ltz" -> ltz, "us-ntz" -> ntz, "ns-long" -> nsl)
  }

  private def run(name: String, dir: String): Seq[Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq

  family.foreach { name =>
    test(s"$name: identical results across ts encodings") {
      val Seq(a, b, c) = Seq("us-ltz", "us-ntz", "ns-long").map(e => run(name, dirs(e)))
      assert(a == b, s"$name: us-ltz vs us-ntz differ")
      assert(a == c, s"$name: us-ltz vs ns-long differ")
      assert(a.nonEmpty, s"$name: canary corpus produced no rows")
    }
  }

  test("Tables.events normalizes every encoding to TIMESTAMP (LTZ)") {
    dirs.values.foreach { d =>
      val dt = Tables.events(spark, d).schema("ts").dataType
      assert(dt == org.apache.spark.sql.types.TimestampType, s"$d → $dt")
    }
  }
}
