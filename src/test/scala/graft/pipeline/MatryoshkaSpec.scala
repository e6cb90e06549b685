package graft.pipeline

import graft.SparkSpec

/** Laws of the truncated-prefix (matryoshka) ANN face (q_ann_matryoshka):
  * the prefix pre-filter is exact when the shortlist covers the corpus,
  * and recall grows with prefix length at a fixed shortlist depth.
  */
class MatryoshkaSpec extends SparkSpec {

  private lazy val e =
    spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")

  private def topSets(prefix: Int, depth: Int): Map[Long, Set[Long]] =
    SimilarityQueries.matryoshkaTopK(e, prefix, depth)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("recall@10 grows with prefix length at fixed shortlist depth") {
    val n = e.count().toInt
    // full-corpus shortlist = exact baseline (the pre-filter is a no-op)
    val exact = topSets(prefix = 16, depth = n)
    def recall(prefix: Int): Double = {
      val got = topSets(prefix, depth = 60)
      val per = exact.map { case (q, ids) => (ids & got(q)).size / 10.0 }
      per.sum / per.size
    }
    val r8 = recall(8)
    val r16 = recall(16)
    val r32 = recall(32)
    info(f"recall@10 by prefix: 8 → $r8%.3f, 16 → $r16%.3f, 32 → $r32%.3f")
    // this corpus is NOT matryoshka-trained, so a raw prefix carries only
    // its share of the (isotropically spread) signal — the measured curve
    // (≈0.39/0.55/0.81) is the honest untrained baseline the scaladoc
    // quotes; PCA rotation concentrates the signal and lifts it (see the
    // pca-prefix face). The LAW gated here is monotonicity + the floor.
    assert(r32 >= r16 && r16 >= r8, "recall must grow with prefix length")
    assert(r16 >= 0.45, s"gate-pinned prefix-16 recall $r16")
    assert(r32 >= 0.7, s"prefix-32 recall $r32")
  }

  test("PCA rotation lifts truncated-prefix recall (the OPQ stage-1 law)") {
    val n = e.count().toInt
    val exact = topSets(prefix = 16, depth = n)
    def recallOf(m: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ids) => (ids & m(q)).size / 10.0 }
      per.sum / per.size
    }
    val raw = recallOf(topSets(prefix = 16, depth = 60))
    val pca = recallOf(
      SimilarityQueries.pcaPrefixTopK(spark, e, components = 16, depth = 60)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })
    info(f"recall@10 at 16 dims, depth 60: raw prefix $raw%.3f, PCA prefix $pca%.3f")
    // measured 0.55 → 0.675 (isotropic within-cluster noise bounds the
    // 16-dim point; the full rotated basis reaches 1.0 — see the scaladoc)
    assert(pca > raw, s"rotation must lift recall: pca $pca vs raw $raw")
    assert(pca >= 0.6, s"PCA-prefix recall $pca")
  }

  test("full-prefix search at full depth reproduces exact top-10 order") {
    // prefix = all 64 dims and a corpus-wide shortlist: both stages exact,
    // so the result must equal the brute-force ranking the rerank computes
    val n = e.count().toInt
    val full = topSets(prefix = 64, depth = n)
    val viaPrefix = topSets(prefix = 16, depth = n)
    assert(full == viaPrefix,
      "rerank must erase the prefix stage when the shortlist is the corpus")
  }
}
