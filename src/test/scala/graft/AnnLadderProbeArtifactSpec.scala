package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed ANN-ladder ×10 probe artifact
  * (`bench/ann_ladder_probe_x10.json`): every round-15 ladder operator
  * has a datapoint, and the growth stays in the linear band — the query
  * batch is FIXED in the probe, so a super-linear ratio would mean a
  * corpus × corpus (or queries × corpus) term crept into a scan.
  */
class AnnLadderProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/ann_ladder_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val ops =
    Seq("binary_hamming", "matryoshka", "pca_prefix", "mmr_corpus_stages")

  test("artifact exists with a datapoint per ladder operator") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("replicas").asInt() == 10)
    ops.foreach { op =>
      val c = root.get(op)
      assert(c != null, s"$op missing from artifact")
      assert(c.get("secs_x1").asDouble() > 0 && c.get("secs_x10").asDouble() > 0, op)
      assert(c.get("rows_x1").asLong() > 0, s"$op produced no rows at x1")
    }
  }

  test("x10 growth stays in the linear band (fixed query batch)") {
    ops.foreach { op =>
      val ratio = root.get(op).get("ratio").asDouble()
      // linear target ≈ 10; allow the ambient + fixed-cost band. A ratio
      // beyond 25 means a quadratic term, not noise — investigate, don't
      // widen.
      assert(ratio < 25.0, s"$op x10 ratio $ratio — super-linear growth")
    }
  }
}
