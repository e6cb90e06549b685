package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate over the COMMITTED round-14 skew probe artifact
  * (`bench/skew_probe_r14.json`, written by [[SkewProbeR14]] — r13
  * verdict item 8): the three previously-untested skew axes (deep BPE
  * hyper-frequent symbol, batched retrieval df = n posting list,
  * bottom-k with a ~99% hot group) must show the skew actually PRESENT
  * and exactness PRESERVED. Re-run `graft.SkewProbeR14` and re-commit if
  * BpeQueries' deep trainer, RetrievalQueries' batch arm, or KMinAgg
  * changes.
  */
class SkewProbeR14ArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/skew_probe_r14.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("artifact exists and each axis's skew is real") {
    assert(java.nio.file.Files.exists(path),
      s"$path missing — run graft.SkewProbeR14 and commit the artifact")
    assert(root.get("bpe").get("hot_share_pct").asDouble() >= 40.0,
      "BPE axis: the planted symbol is not hyper-frequent")
    val rrf = root.get("rrf")
    assert(rrf.get("planted_df").asLong() == rrf.get("n_docs").asLong(),
      "retrieval axis: the planted term is not in EVERY document (df < n)")
    assert(rrf.get("max_cand_per_query").asLong() >=
      (rrf.get("n_docs").asLong() * 9) / 10,
      "retrieval axis: the planted term did not saturate the posting list")
    val bk = root.get("bottomk")
    assert(bk.get("hot_group_docs").asLong() * 10 >=
      bk.get("total_docs").asLong() * 9,
      "bottom-k axis: the hot group does not dominate")
    val sk = root.get("sketch")
    assert(sk != null, "sketch axis missing — re-run graft.SkewProbeR14")
    // ~100% of the const group sits in ONE bucket (value + 2 outliers)
    assert(sk.get("const_rows").asLong() >= 500 &&
      sk.get("const_buckets").asLong() <= 3,
      "sketch axis: the constant group is not degenerate enough")
    // and the max-domain value reaches the sketch's TOP bucket exactly
    assert(sk.get("top_max_id").asLong() ==
      sk.get("num_buckets").asLong() - 1,
      "sketch axis: Long.MaxValue did not land in the top bucket")
  }

  test("exactness preserved under every skew axis") {
    // the deep trainer hard-fails in-run if the batched fold diverges
    // from the closed-form site counts; a written artifact implies it held
    assert(root.get("bpe").get("hard_check").asText() == "passed")
    assert(root.get("bpe").get("rules").asLong() > 0)
    // bounded kminBy shortlists == unguarded rank windows, pair for pair
    assert(root.get("rrf").get("shortlist_diff").asLong() == 0,
      "kminBy retrieval shortlist diverged from the rank window under skew")
    assert(root.get("bottomk").get("sample_diff").asLong() == 0,
      "kminBy bottom-k sample diverged from the sort-based sample under skew")
    // every readout row's selected bucket contains the exact discrete
    // order statistic (rank error 0) at both degenerate extremes
    assert(root.get("sketch").get("within_violations").asLong() == 0,
      "quantile-sketch readout lost containment at a degenerate extreme")
    assert(root.get("sketch").get("readout_rows").asLong() == 6,
      "expected 2 groups x 3 quantiles of sketch readout rows")
  }
}
