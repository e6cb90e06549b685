package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the quality-gate operators that the DuckDB oracle cannot
  * express (deflate determinism, sampling exactness/pre-filter sufficiency).
  */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("deflateLengths is deterministic and separates repetitive from random text") {
    val docs = Seq(
      (1L, "rep", "spam spam spam " * 200),
      (2L, "nat", "The quick brown fox jumps over the lazy dog near the riverbank at dawn. " * 20),
      (3L, "rand", (1 to 400).map(i => java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")),
      (4L, "nil", ""),
      (5L, "nul", null)
    ).toDF("doc_id", "source", "text")

    val a = QualityGateQueries.deflateLengths(docs).orderBy("doc_id").collect()
    val b = QualityGateQueries.deflateLengths(docs).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "deflate output must be bit-stable across runs")

    val byId = a.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (repB, repZ) = byId(1L)
    val (ranB, ranZ) = byId(3L)
    assert(repZ * 100 < repB * 10, s"repeated text should compress <10%, got $repZ/$repB")
    assert(ranZ * 100 > ranB * 50, s"hex soup should stay >50%, got $ranZ/$ranB")
    // empty / NULL text: zlib header+trailer only, never a crash or a drop
    assert(byId(4L)._1 == 0L && byId(5L)._1 == 0L)
    assert(a.length == 5)
  }

  test("stratifiedSample returns exactly N per stratum (pre-filter never undershoots on testdata)") {
    // sf0.01: 25 docs/stratum → band keeps everything (small-stratum path).
    // sf0.1: 250 docs/stratum → band genuinely filters (~40 of 250 survive
    // to the window) and must still contain all 10 winners.
    for (scale <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.analytics.Tables.documents(spark, sf(scale))
      val out = QualityGateQueries.stratifiedSample(docs, perStratum = 10)
      val perSource = out.groupBy("source").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val nSources = docs.select("source").distinct().count()
      assert(perSource.length == nSources, s"$scale: missing strata")
      perSource.foreach { case (src, n, maxrk) =>
        assert(n == 10L && maxrk == 10L, s"$scale stratum $src returned $n rows (max rk $maxrk), want 10")
      }
    }
    // determinism: same rows both runs
    val docs = graft.analytics.Tables.documents(spark, sf("sf0.01"))
    val out = QualityGateQueries.stratifiedSample(docs, perStratum = 10)
    val again = QualityGateQueries.stratifiedSample(docs, perStratum = 10)
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("stratifiedSample stays exact when a stratum is smaller than N") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
      .withColumn("text", lit("x"))
    val out = QualityGateQueries.stratifiedSample(tiny, perStratum = 40)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // band = 4N·2³²/n ≥ 2³² for n ≤ 4N → no row is pre-filtered out
    assert(out.map(t => (t._1, t._3)).toSet == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }
}
