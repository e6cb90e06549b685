package graft.functions

import graft.SparkSpec
import graft.functions.SnowflakeFunctions._
import org.apache.spark.sql.functions._

class SnowflakeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("sfDateDiffYears uses calendar-year difference, not elapsed years") {
    // Snowflake DATEDIFF(year, '2000-12-31', '2001-01-01') = 1
    val df = Seq(("2000-12-31", "2001-01-01"), ("2000-01-01", "2000-12-31"))
      .toDF("a", "b")
      .select(sfDateDiffYears($"a".cast("date"), $"b".cast("date")).as("d"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }

  test("sfDayOfWeek is 0=Sunday..6=Saturday") {
    // 2024-01-07 was a Sunday
    val d = Seq("2024-01-07", "2024-01-08", "2024-01-13").toDF("d")
      .select(sfDayOfWeek($"d".cast("date")).as("dow"))
      .collect().map(_.getInt(0)).toSeq
    assert(d == Seq(0, 1, 6))
  }

  test("TO_CHAR pattern translation covers the reference dialect") {
    assert(translateToCharPattern("HH24:MI") == "HH:mm")
    assert(translateToCharPattern("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss")
    assert(translateToCharPattern("YYYY-MM") == "yyyy-MM")
  }

  test("sfTimestampDiffMinutes counts minute boundaries") {
    val df = Seq(("2024-01-01 10:00:59", "2024-01-01 10:01:00"),
      ("2024-01-01 10:00:00", "2024-01-01 10:59:59"))
      .toDF("a", "b")
      .select(sfTimestampDiffMinutes($"a".cast("timestamp"), $"b".cast("timestamp")).as("m"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 59L))
  }

  test("listaggDistinctOrdered dedups and sorts") {
    val out = Seq("b", "a", "b", "c").toDF("v")
      .agg(listaggDistinctOrdered($"v", ", ").as("s"))
      .collect()(0).getString(0)
    assert(out == "a, b, c")
  }

  test("exactAvg is reproducible across repartitioning") {
    val base = spark.range(1, 10001).select((rand(42) * 1000).as("x"))
    val a = base.repartition(1).agg(exactAvg($"x")).collect()(0).getDouble(0)
    val b = base.repartition(7).agg(exactAvg($"x")).collect()(0).getDouble(0)
    assert(a == b) // bit-exact, not approximately
  }
}
