package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed data-selection ×10 probe artifact
  * (`bench/selection_probe_x10.json`): both selection faces have a
  * datapoint and growth stays in the linear band — the pool replicas
  * multiply the corpus pass and the doc-keyed aggregate ×10 against a
  * FIXED broadcast λ, so far-super-linear growth would mean the served
  * plan stopped being corpus-pass-bounded.
  */
class SelectionProbeArtifactSpec extends AnyFunSuite {
  private val path =
    java.nio.file.Paths.get("bench/selection_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val ops = Seq("dsir_weights", "select_budget")

  test("artifact exists with a datapoint per selection face") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("replicas").asInt() == 10)
    ops.foreach { op =>
      val c = root.get(op)
      assert(c != null, s"$op missing from artifact")
      assert(c.get("secs_x1").asDouble() > 0 && c.get("secs_x10").asDouble() > 0, op)
    }
    // ×10 pool at the same budget fraction ⇒ strictly more selected docs
    assert(root.get("select_budget").get("out_x10").asLong() >
      root.get("select_budget").get("out_x1").asLong())
  }

  test("x10 growth stays in the linear band") {
    ops.foreach { op =>
      val ratio = root.get(op).get("ratio").asDouble()
      assert(ratio < 30.0, s"$op x10 ratio $ratio — super-linear growth")
    }
  }
}
