package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Md5Util, SketchExpressions}

/** Equivalence gates for the native [[org.apache.spark.sql.graft.Md5Hi64]]
  * / [[org.apache.spark.sql.graft.Rho32]] expressions against the SQL
  * md5→hex→conv chains they replaced (r10 verdict item 2): every hex-prefix
  * width the sketch family uses, on fixed + seeded-random strings through
  * the REAL executed plan (so the codegen'd path is the tested artifact),
  * plus the rho boundary sweep.
  */
class SketchExprSpec extends SparkSpec {

  private def chainVsNative(rows: Seq[String]): Unit = {
    import spark.implicits._
    val df = rows.toDF("s")
      .withColumn("h8", SketchExpressions.md5Hi64(col("s")))
      .select(
        col("s"),
        // the five derivations the sketch queries use
        expr("CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 2), 16, 10) AS BIGINT)").as("c2"),
        expr("CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 4), 16, 10) AS BIGINT)").as("c4"),
        expr("CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 8), 16, 10) AS BIGINT)").as("c8"),
        expr("CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 12), 16, 10) AS BIGINT)").as("c12"),
        expr("CAST(conv(substr(md5(CAST(s AS BINARY)), 3, 8), 16, 10) AS BIGINT)").as("c38"),
        expr("shiftrightunsigned(h8, 56)").as("n2"),
        expr("shiftrightunsigned(h8, 48)").as("n4"),
        expr("shiftrightunsigned(h8, 32)").as("n8"),
        expr("shiftrightunsigned(h8, 16)").as("n12"),
        expr("shiftrightunsigned(h8, 24) & 4294967295").as("n38"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(6), s"2-hex mismatch for '${r.getString(0)}'")
      assert(r.getLong(2) == r.getLong(7), s"4-hex mismatch for '${r.getString(0)}'")
      assert(r.getLong(3) == r.getLong(8), s"8-hex mismatch for '${r.getString(0)}'")
      assert(r.getLong(4) == r.getLong(9), s"12-hex mismatch for '${r.getString(0)}'")
      assert(r.getLong(5) == r.getLong(10), s"3..10-hex mismatch for '${r.getString(0)}'")
    }
  }

  test("md5_hi64 shift derivations equal the hex-substr-conv chains (fixed corpus)") {
    chainVsNative(Seq("", "a", "hll:the quick", "kmv:x y z", "rh:42:2024-01-01 07:00:00",
      "ab:7:13", "wsamp:123456", "cms0:tok", "Üñíçødé ✓", " binary-ish"))
  }

  test("md5_hi64 shift derivations equal the hex chains (seeded random strings)") {
    val rng = new scala.util.Random(4711)
    val strs = Seq.fill(500) {
      val n = rng.nextInt(40)
      // mix ASCII and multi-byte codepoints so UTF-8 encoding is exercised
      (0 until n).map { _ =>
        if (rng.nextInt(5) == 0) (0x80 + rng.nextInt(0x2000)).toChar
        else (0x20 + rng.nextInt(0x5f)).toChar
      }.mkString
    }
    chainVsNative(strs)
  }

  test("rho32 equals IF(hv=0,33,33-length(bin(hv))) across [0,2^32) boundaries") {
    import spark.implicits._
    val hvs = ((0 to 31).flatMap(b => Seq((1L << b) - 1, 1L << b, (1L << b) + 1)) ++
      Seq(0L, (1L << 32) - 1)).distinct.filter(v => v >= 0 && v < (1L << 32))
    val df = hvs.toDF("hv")
      .select(col("hv"),
        expr("IF(hv = 0, 33, 33 - length(bin(hv)))").as("sql_rho"),
        SketchExpressions.hllRho32(col("hv")).as("native_rho"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"rho mismatch at hv=${r.getLong(0)}")
    }
  }

  test("driver-side Md5Util.hi64 agrees with the executed expression") {
    import spark.implicits._
    val rows = Seq("hll:alpha", "", "βγδ")
    val exec = rows.toDF("s")
      .select(SketchExpressions.md5Hi64(col("s")).as("h8"))
      .collect().map(_.getLong(0))
    val local = rows.map(s => Md5Util.hi64(s.getBytes("UTF-8")))
    assert(exec.toSeq == local)
  }

  test("md5_hi64 is null-safe") {
    import spark.implicits._
    val r = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(SketchExpressions.md5Hi64(col("s")).as("h8")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
