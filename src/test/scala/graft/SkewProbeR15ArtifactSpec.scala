package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed round-15 skew-probe artifact
  * (`bench/skew_probe_r15.json`): each axis's skew is REAL (the hot
  * gram/cluster actually dominates) and exactness survived it — every
  * diff counter is zero.
  */
class SkewProbeR15ArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/skew_probe_r15.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("artifact exists and each axis's skew is real") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    // every 2nd token is the hot gram → 50% of the unigram mass = ~25%
    // of ALL feature instances land in one hash bucket
    assert(root.get("dsir_hot_bucket").get("hot_gram_pct").asDouble() > 20.0,
      "hot gram does not dominate the feature stream")
    assert(root.get("dsir_hot_bucket").get("docs").asInt() > 0)
    assert(root.get("prefix_total_tie").get("docs").asInt() > 0)
    assert(root.get("proto_hot_cluster").get("hot_cluster_pct").asDouble() > 90.0,
      "hot cluster does not dominate the assignment")
    assert(root.get("proto_hot_cluster").get("kept").asInt() > 0)
  }

  test("exactness preserved under every skew axis") {
    Seq("dsir_hot_bucket", "prefix_total_tie", "proto_hot_cluster").foreach { axis =>
      assert(root.get(axis).get("diffs").asInt() == 0,
        s"$axis drifted from its unguarded reference")
    }
  }
}
