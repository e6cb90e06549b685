package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed tokenizer-serving ×10 probe artifact
  * (`bench/tokenizer_serve_probe_x10.json`): both serving families have
  * a datapoint and the growth stays in the linear band — replicas grow
  * BOTH the corpus pass and the distinct-word inventory ×10 (tagged
  * words are ~2 chars longer, so slightly-super-10× is expected; far
  * beyond means the encode stopped being distinct-word-bounded).
  */
class TokenizerServeProbeArtifactSpec extends AnyFunSuite {
  private val path =
    java.nio.file.Paths.get("bench/tokenizer_serve_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val ops = Seq("wordpiece", "unigram")

  test("artifact exists with a datapoint per tokenizer family") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("replicas").asInt() == 10)
    ops.foreach { op =>
      val c = root.get(op)
      assert(c != null, s"$op missing from artifact")
      assert(c.get("secs_x1").asDouble() > 0 && c.get("secs_x10").asDouble() > 0, op)
      // ×10 corpus with disjoint tagged words ⇒ strictly more pieces
      assert(c.get("pieces_x10").asLong() > c.get("pieces_x1").asLong(), op)
    }
  }

  test("x10 growth stays in the linear band (fixed inventory, bounded encode)") {
    ops.foreach { op =>
      val ratio = root.get(op).get("ratio").asDouble()
      assert(ratio < 30.0, s"$op x10 ratio $ratio — super-linear growth")
    }
  }
}
