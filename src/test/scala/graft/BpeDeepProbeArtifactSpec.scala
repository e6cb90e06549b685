package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate over the COMMITTED deep-BPE probe artifact
  * (`bench/bpe_deep_probe.json`, written by [[BpeDeepProbe]] — r13
  * verdict item 1): the batched trainer's wall-clock must scale with
  * PASSES, not merges. Same pass count, batch = 1 vs batch = 32: the
  * rules ratio must be large while the seconds ratio stays near 1.
  * Re-run `graft.BpeDeepProbe` and re-commit if the trainer changes.
  */
class BpeDeepProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/bpe_deep_probe.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("probe artifact exists with both batch widths at equal pass count") {
    assert(java.nio.file.Files.exists(path),
      s"$path missing — run graft.BpeDeepProbe and commit the artifact")
    assert(root.get("passes").asInt() >= 4)
    assert(root.get("batch1").get("rules").asLong() == root.get("passes").asLong(),
      "batch=1 must learn exactly one rule per pass (the round-serial shape)")
  }

  test("wall-clock grows with passes, not merges") {
    val r1 = root.get("batch1")
    val r32 = root.get("batch32")
    val rulesRatio = r32.get("rules").asDouble() / r1.get("rules").asDouble()
    val secsRatio = r32.get("secs").asDouble() / r1.get("secs").asDouble()
    assert(rulesRatio >= 8.0,
      s"batch=32 learned only ${rulesRatio}x the rules of batch=1")
    assert(secsRatio <= 2.0,
      s"batch=32 cost ${secsRatio}x the wall-clock of batch=1 — " +
        "the batched pass is no longer merge-count-free")
  }
}
