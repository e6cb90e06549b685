package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates bench/r17_probe_x100.json — the ×100 growth receipts for the
  * round-16 wave (r16 verdict ask #2, the r11 ×100 discipline). Re-run
  * graft.R17ScaleProbe after touching InfluenceQueries,
  * FirstWinsDedupQueries, ContainmentQueries, the hybrid retrieval/eval
  * chain, or the aHash face.
  */
class R17ProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/r17_probe_x100.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val ops = Seq("influence_scores", "dedup_first_wins",
    "dedup_containment", "eval_retrieval_hybrid", "multimodal_ahash")

  test("artifact exists with a x100 datapoint per face") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("replicas").asInt() == 100)
    ops.foreach { op =>
      val c = root.get(op)
      assert(c != null, s"$op missing from artifact")
      assert(c.get("secs_x1").asDouble() > 0 && c.get("secs_x100").asDouble() > 0, op)
    }
  }

  test("x100 growth stays strongly sub-linear") {
    // measured 16.5–39.3× for ×100 data; 100× would be exactly linear and
    // a quadratic regression lands in the thousands — the 80 bound keeps
    // ~2× headroom over the measured constants while catching any
    // super-linear drift decisively
    ops.foreach { op =>
      val ratio = root.get(op).get("ratio").asDouble()
      assert(ratio < 80.0, s"$op x100 ratio $ratio — super-linear growth")
    }
  }

  test("per-replica structure is preserved exactly where the axis pins it") {
    // the token-suffix perturbation is a bijective renaming per replica, so
    // first-wins output must be EXACTLY 100 * the x1 output
    val fw = root.get("dedup_first_wins")
    assert(fw.get("out_x100").asLong() == 100L * fw.get("out_x1").asLong(),
      s"first-wins x100 checksum ${fw.get("out_x100")} != 100 * ${fw.get("out_x1")}")
  }
}
