package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.functions._

/** Embedding near-dup CLUSTERS — the dedup ACTION face the pair gates
  * stop short of: production semantic dedup doesn't ship a pair list, it
  * picks one survivor per transitive duplicate cluster and drops the
  * rest. Pairs come from the registered RP-LSH banded face
  * ([[SimilarityQueries.embeddingNearDupPairsLsh]], τ = 0.42, adaptive
  * banding + skew guard); clusters are connected components over those
  * pairs ([[graft.operators.ConnectedComponents.minLabel]] — the same
  * min-label operator the corpus-clean CC policy uses); the survivor is
  * the cluster minimum, the deterministic canonical-representative
  * policy every dedup face in this repo shares.
  *
  * Scale shape: candidate volume is the LSH face's O(bands·n·128)
  * contract; the CC stage is edge-linear (min-label rounds bounded by
  * dup-cluster diameter, with the bounded union-find fast path for
  * blocked pair graphs); the output is one row per CLUSTERED vector —
  * singletons never materialize. The candidate set is staged and the
  * oracle replays rescoring, the transitive closure (recursive CTE) and
  * the survivor policy cross-engine.
  */
object EmbeddingClusterQueries {

  private val Tau = 0.42

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_dedup_embedding_clusters",
      s"""WITH RECURSIVE cand AS (
         |  SELECT vec_a, vec_b FROM ${graft.OracleStage.pq("cands_embclus")}),
         |qpairs AS (
         |  SELECT c.vec_a AS a, c.vec_b AS b
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.vec_a
         |  JOIN embeddings eb ON eb.vec_id = c.vec_b
         |  WHERE ROUND(${SimilarityQueries.cosSql("ea.embedding", "eb.embedding")}, 9) >= $Tau),
         |edges AS (SELECT a, b FROM qpairs UNION ALL SELECT b, a FROM qpairs),
         |closure(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a)
         |SELECT a AS vec_id,
         |       LEAST(a, MIN(b)) AS cluster_rep,
         |       a = LEAST(a, MIN(b)) AS is_survivor
         |FROM closure GROUP BY a
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val pairs = SimilarityQueries.embeddingNearDupPairsLsh(
        Tables.embeddings(s, d), minCos = Tau, stage = Some("cands_embclus"))
        .select(col("vec_a"), col("vec_b"))
      val reps = graft.operators.ConnectedComponents.minLabel(pairs)
        .toDF("vec_id", "rep")
      reps.select(col("vec_id"),
          least(col("vec_id"), col("rep")).as("cluster_rep"))
        .withColumn("is_survivor", col("vec_id") === col("cluster_rep"))
        .orderBy("vec_id")
    })
}
