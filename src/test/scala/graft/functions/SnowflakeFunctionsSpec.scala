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

  test("dialect shims are callable as SQL text after registration") {
    org.apache.spark.sql.graft.DialectFunctions.register(spark)
    Seq(("2024-01-05 10:00:59", "2025-03-01 10:01:00", "b"),
      ("2024-06-01 08:30:00", "2024-06-01 09:29:59", "a"),
      ("2024-06-01 08:30:00", "2024-06-01 09:29:59", "a"))
      .toDF("a", "b", "tag").createOrReplaceTempView("dialect_t")
    val row = spark.sql(
      """SELECT sf_datediff_years(CAST(a AS DATE), CAST(b AS DATE)) AS dy,
        |       sf_timestampdiff_minutes(CAST(a AS TIMESTAMP), CAST(b AS TIMESTAMP)) AS dm,
        |       sf_dayofweek(CAST(a AS DATE)) AS dow,
        |       sf_dayname(CAST(a AS DATE)) AS dn,
        |       sf_to_char(CAST(a AS TIMESTAMP), 'YYYY-MM HH24:MI') AS tc,
        |       sf_pct_of(CAST(1 AS DOUBLE), 4) AS pct
        |FROM dialect_t ORDER BY a LIMIT 1""".stripMargin).collect()(0)
    assert(row.getAs[Int]("dy") == 1)         // 2025 - 2024
    assert(row.getAs[Long]("dm") == 606241L)  // 421 days × 1440 + 1 boundary
    assert(row.getAs[Int]("dow") == 5)        // 2024-01-05 = Friday, 0=Sun
    assert(row.getAs[String]("dn") == "Fri")
    assert(row.getAs[String]("tc") == "2024-01 10:00")
    assert(row.getAs[Double]("pct") == 25.0)
    // the aggregate shim composes into SQL GROUP BY
    val agg = spark.sql(
      """SELECT tag, sf_listagg_distinct(a, ',') AS vals
        |FROM dialect_t GROUP BY tag ORDER BY tag""".stripMargin).collect()
    assert(agg.length == 2 && agg(0).getString(1) == "2024-06-01 08:30:00")
    // SQL equals the Column-API shim on real data (one source of truth)
    val viaSql = spark.sql(
      "SELECT sf_dayofweek(CAST(a AS DATE)) AS d FROM dialect_t ORDER BY a")
      .collect().map(_.getInt(0)).toSeq
    val viaCol = spark.table("dialect_t")
      .select(sfDayOfWeek($"a".cast("date")).as("d")).orderBy($"a")
      .collect().map(_.getInt(0)).toSeq
    assert(viaSql == viaCol)
    // non-literal patterns are rejected, not silently misformatted
    intercept[Exception] {
      spark.sql("SELECT sf_to_char(CAST(a AS TIMESTAMP), tag) FROM dialect_t").collect()
    }
  }

  test("moneyAvg2 rounds half-cent quotients HALF_UP (the hc_daily_revenue invariant)") {
    // the four half-cent sums that kept hc_daily_revenue red for 4 rounds:
    // 523.77/2=261.885, 498.51/2, 440.51/2, 483.95/2 — HALF_UP must round UP
    val pairs = Seq(
      ("d1", 261.88), ("d1", 261.89), ("d2", 249.25), ("d2", 249.26),
      ("d3", 220.25), ("d3", 220.26), ("d4", 241.97), ("d4", 241.98))
    val got = pairs.toDF("g", "x").groupBy("g").agg(moneyAvg2($"x").as("a"))
      .orderBy("g").collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(261.89, 249.26, 220.26, 241.98))
    // moneyAvg2 == the oracle's integer-cents identity (2c+n) div (2n) / 100
    // on arbitrary non-negative cents data, at any group size
    val base = spark.range(0, 5000)
      .selectExpr("id % 37 AS g", "ROUND(rand(7) * 1000, 2) AS x")
    val mismatches = base.groupBy("g")
      .agg(sum(dec2($"x")).as("s"), count($"x").as("n"), moneyAvg2($"x").as("a"))
      .selectExpr("a", "CAST((2*CAST(s*100 AS BIGINT) + n) DIV (2*n) AS DOUBLE)/100 AS b")
      .where("a <> b").count()
    assert(mismatches == 0L)
  }

  test("exactAvg is reproducible across repartitioning") {
    val base = spark.range(1, 10001).select((rand(42) * 1000).as("x"))
    val a = base.repartition(1).agg(exactAvg($"x")).collect()(0).getDouble(0)
    val b = base.repartition(7).agg(exactAvg($"x")).collect()(0).getDouble(0)
    assert(a == b) // bit-exact, not approximately
  }
}
