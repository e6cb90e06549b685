package graft.pipeline

import graft.SparkSpec
import graft.analytics.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Statistical properties of the distinct-count sketches beyond the oracle
  * hash-gate: the gate pins determinism, these pin the MATH — mergeability
  * (the property that makes the sketches distributed operators at all) and
  * realized error against the published bounds.
  */
class SketchSpec extends SparkSpec {

  private def shingleFrame(dir: String) =
    Tables.documents(spark, dir)
      .select(col("source"), explode(TextFunctions.wordShingles(
        TextFunctions.tokens(col("text")))).as("tok"))
      .distinct()

  test("HLL mergeability: max-merged per-source registers == whole-corpus registers") {
    val tok = shingleFrame(sf("sf0.01"))
    val perSourceMerged = CorpusStatsQueries.hllRegisters(tok)
      .groupBy("bucket").agg(max("m").as("m"))
    val global = CorpusStatsQueries.hllRegisters(tok.withColumn("source", lit("all")))
      .select(col("bucket"), col("m"))
    val diff = perSourceMerged.as("a").join(global.as("b"), Seq("bucket"), "full")
      .filter(coalesce(col("a.m"), lit(-1)) =!= coalesce(col("b.m"), lit(-1)))
      .count()
    assert(diff == 0, "merging shard registers must equal the registers of the union")
  }

  test("HLL register build map-side combines (partial_max before the exchange)") {
    val p = CorpusStatsQueries.hllRegisters(shingleFrame(sf()))
      .queryExecution.sparkPlan.toString
    assert(p.contains("partial_max"), p.take(3000))
  }

  test("HLL realized error stays inside 3σ of the m=256 bound on every gate row") {
    // σ = 1.04/√256 = 6.5% → 3σ = 19.5%. Raw-HLL contract (no small-range
    // correction) holds on the gate corpus because every row's cardinality
    // is above the 2.5·m correction threshold — assert that precondition
    // too, so a corpus regen that breaks it is caught HERE, not as a
    // mysterious error blow-up.
    val rows = graft.SparkEntry.queries("q_distinct_hll")(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val err = r.getAs[Long]("err_permille")
      assert(exact > (2.5 * 256).toLong,
        s"${r.getAs[String]("source")}: cardinality $exact inside the linear-counting region")
      assert(err <= 195, s"${r.getAs[String]("source")}: err ${err}‰ beyond 3σ of 65‰")
    }
  }

  test("rolling HLL: every gate window clears the 2.5·m threshold and errors stay in 3σ") {
    // σ = 1.04/√128 ≈ 9.2% → 3σ ≈ 276‰ (observed max at sf0.01: 100‰).
    // The precondition assert is the real guard: the raw-HLL contract is
    // only honest above 2.5·m = 320 distinct per window — a testdata regen
    // that shrinks the event stream must fail HERE, not as silent bias.
    val rows = graft.SparkEntry.queries("q_distinct_rolling_hll")(spark, sf("sf0.01")).collect()
    assert(rows.length >= 7, "expected at least a week of windows")
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact_7d")
      assert(exact > 320, s"${r.get(0)}: window cardinality $exact inside linear-counting region")
      assert(r.getAs[Long]("err_permille") <= 276,
        s"${r.get(0)}: err ${r.getAs[Long]("err_permille")}‰ beyond 3σ")
    }
  }

  test("rolling HLL merge window partitions by bucket — never a global sort") {
    val p = graft.SparkEntry.queries("q_distinct_rolling_hll")(spark, sf())
      .queryExecution.sparkPlan.toString
    assert(p.contains("windowspecdefinition(bucket#"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("KMV A-not-B churn estimates track exact within a 20% band, never negative") {
    // at the gate scale the daily sketches are barely saturated
    // (n ≈ 320 vs k = 256) so realized error is tight (observed ≤ 66‰);
    // 200‰ leaves room for the saturated regime without letting a
    // broken estimator pass
    val rows = graft.SparkEntry.queries("q_distinct_anotb_kmv")(spark, sf("sf0.01")).collect()
    assert(rows.length >= 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new_exact") > 0)
      assert(r.getAs[Long]("n_new_est") >= 0, "difference estimates must clamp at zero")
      assert(r.getAs[Long]("err_permille") <= 200,
        s"${r.get(0)}: err ${r.getAs[Long]("err_permille")}‰")
    }
  }

  test("KMV pair estimates stay within a 3-resolution band of exact Jaccard") {
    // k=256 → estimate resolution ~4‰ and binomial σ ≈ √(J(1−J)/k); the
    // gate rows all have J ≤ ~90‰ → σ ≤ ~18‰. 3σ + resolution ≈ 60‰ is a
    // generous-but-meaningful band (observed max 47‰ at sf0.01).
    val rows = graft.SparkEntry.queries("q_distinct_kmv_intersect")(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Long]("abs_err_permille")
      assert(err <= 60,
        s"${r.getAs[String]("source_a")}/${r.getAs[String]("source_b")}: err ${err}‰")
    }
  }
}
