package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.KMinAgg
import graft.functions.VectorFunctions.{dot, norm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) benchmark decontamination — the dense
  * complement of q_decontaminate's shared-n-gram rule: a training doc is
  * contaminated when its EMBEDDING sits above τ cosine to any eval-set
  * item, which catches paraphrased / reformatted benchmark leakage that
  * exact 5-gram overlap misses (the standard second hygiene pass in
  * pre-training corpora).
  *
  * Eval-set fixture: the organic holdout (every 97th vector, kept OUT of
  * the corpus — mostly below τ, the negatives) plus PLANTED verbatim
  * leaks — every 50th corpus vector re-appears as an eval item under
  * eval_id = vec_id + 10⁹ (benchmark text scraped into training
  * verbatim, the most common real contamination). The gate must flag
  * every planted source through its exact copy and whatever organic
  * pairs cross τ = 0.42 (this corpus's near-dup range, the
  * q_dedup_embedding threshold).
  *
  * Scale shape: candidates come from RP-LSH band-key equality between
  * the corpus banding (map-side expression) and the BROADCAST banded
  * eval set — benchmarks are small by construction, so the corpus never
  * shuffles to discover it is clean (same law as q_decontaminate's
  * broadcast semi-join). Exact cosine re-scores candidates only;
  * per-doc readout is a bounded kminBy(1) argmax. Identical vectors
  * share every band key, so planted verbatim leaks are candidates with
  * probability 1; organic recall follows the 10×3-band curve the LSH
  * dedup faces gate. The candidate set is staged ([[graft.OracleStage]])
  * and the oracle re-verifies the whole exact stage — join, cosine,
  * threshold, per-doc aggregation, argmax tie-break — cross-engine.
  */
object SemanticDeconQueries {

  private val Tau = 0.42
  private val PlantEvery = 50 // every 50th corpus vector leaks verbatim
  private val HoldEvery = 97 // organic holdout slice (out of corpus)
  private val PlantBase = 1000000000L // planted eval_id offset

  private def cosX1e9(a: String, b: String): String =
    s"CAST(ROUND((${SimilarityQueries.cosSql(a, b)}) * 1000000000) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_decontaminate_semantic",
      s"""WITH ev AS (
         |  SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id % $HoldEvery = 0
         |  UNION ALL
         |  SELECT vec_id + $PlantBase AS eval_id, embedding FROM embeddings
         |  WHERE vec_id % $PlantEvery = 0 AND vec_id % $HoldEvery <> 0),
         |cand AS (SELECT vec_id, eval_id FROM ${graft.OracleStage.pq("cands_semdecon")}),
         |sc AS (SELECT c.vec_id, c.eval_id,
         |              ${cosX1e9("a.embedding", "ev.embedding")} AS cos_x1e9
         |       FROM cand c
         |       JOIN embeddings a ON a.vec_id = c.vec_id
         |       JOIN ev ON ev.eval_id = c.eval_id
         |       WHERE ROUND(${SimilarityQueries.cosSql("a.embedding", "ev.embedding")}, 9) >= $Tau),
         |top AS (SELECT vec_id, eval_id, cos_x1e9,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos_x1e9 DESC, eval_id) AS rn,
         |               COUNT(*) OVER (PARTITION BY vec_id) AS n_hits
         |        FROM sc)
         |SELECT vec_id, CAST(n_hits AS BIGINT) AS n_hits,
         |       eval_id AS top_eval_id, cos_x1e9 AS max_cos_x1e9
         |FROM top WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val corpus = e.filter(col("vec_id") % HoldEvery =!= 0)
      val eval: DataFrame = e.filter(col("vec_id") % HoldEvery === 0)
        .select(col("vec_id").as("eval_id"), col("embedding"))
        .union(e.filter(col("vec_id") % PlantEvery === 0 &&
            col("vec_id") % HoldEvery =!= 0)
          .select((col("vec_id") + PlantBase).as("eval_id"), col("embedding")))
      // banding sized on the base-table metadata count (the corpus is a
      // ~99% slice of it); ≤1024 vectors → the original 10×3 bands
      flaggedFrom(corpus, eval, e.count(), stage = Some("cands_semdecon"))
    })

  /** The full decontamination pipeline over explicit corpus/eval frames —
    * shared by the gate and the ×10 scale probe (which grows the corpus
    * against a FIXED eval set, the production axis).
    */
  private[graft] def flaggedFrom(corpus: DataFrame, eval: DataFrame,
      bandSizeN: Long, stage: Option[String] = None): DataFrame = {
    val (bits, bands) = SimilarityQueries.adaptiveBanding(bandSizeN)
    def banded(df: DataFrame, idCol: String) = df.select(col(idCol),
      posexplode(SimilarityQueries.rpBandKeys(col("embedding"),
        bands = bands, rowsPerBand = bits)).as(Seq("band_id", "band_key")))

    // corpus bands are a map-side expression; the banded eval set is
    // broadcast (benchmark-sized) — the corpus never shuffles
    val cands0 = banded(corpus, "vec_id")
      .join(broadcast(banded(eval, "eval_id")), Seq("band_id", "band_key"))
      .select("vec_id", "eval_id").distinct()
    val cands = stage.map(graft.OracleStage.stage(_, cands0)).getOrElse(cands0)

    val evalVecs = eval.select(col("eval_id"),
      col("embedding").as("ee"), norm(col("embedding")).as("ne"))
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding").as("ec"),
        norm(col("embedding")).as("nc")), "vec_id")
      .join(broadcast(evalVecs), "eval_id")
      .withColumn("cos", dot(col("ec"), col("ee")) / (col("nc") * col("ne")))
      .filter(round(col("cos"), 9) >= Tau)
      .select(col("vec_id"), col("eval_id"),
        round(col("cos") * 1000000000L, 0).cast("long").as("cos_x1e9"))

    scored.groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"),
        KMinAgg.kminBy(-col("cos_x1e9"), col("eval_id"), 1).as("mins"))
      .select(col("vec_id"), col("n_hits"),
        col("mins")(0).getField("id").as("top_eval_id"),
        (-col("mins")(0).getField("h")).as("max_cos_x1e9"))
      .orderBy("vec_id")
  }
}
