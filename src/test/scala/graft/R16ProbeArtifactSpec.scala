package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates bench/r16_probe_x10.json — the ×10 growth receipts for the
  * round-16 operator additions. Re-run graft.R16ScaleProbe after touching
  * SemanticDeconQueries, TripletQueries, InfluenceQueries,
  * RetrievalEvalQueries or the aHash face.
  */
class R16ProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/r16_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val ops = Seq("decontaminate_semantic", "triplet_mining",
    "influence_scores", "eval_retrieval", "multimodal_ahash")

  test("artifact exists with a datapoint per round-16 face") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("replicas").asInt() == 10)
    ops.foreach { op =>
      val c = root.get(op)
      assert(c != null, s"$op missing from artifact")
      assert(c.get("secs_x1").asDouble() > 0 && c.get("secs_x10").asDouble() > 0, op)
    }
  }

  test("x10 growth stays in the linear band") {
    // Bound = measured ratios (3.2–11.0 in the committed artifact) plus
    // slack, NOT a loose 30 (which admits ~n^1.48 — r16 advice): a mildly
    // quadratic regression in any face must trip this, while idle-band
    // noise on the measured constants must not.
    ops.foreach { op =>
      val ratio = root.get(op).get("ratio").asDouble()
      assert(ratio < 15.0, s"$op x10 ratio $ratio — super-linear growth")
    }
  }
}
