package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate over the COMMITTED deep-BPE depth probe artifact
  * (`bench/bpe_depth_probe.json`, written by [[BpeDepthProbe]] — r14
  * verdict item 4): the depth law beyond the gated regime. The
  * registered gate proves 18×32 ≈ 274 rules; this artifact proves the
  * SAME loop reaches ≥ 4,096 rules on a wide-vocabulary corpus with
  * per-pass wall-clock FLAT (cost never grows with how many rules have
  * already been learned — the round-serial trainer's failure mode).
  * Re-run `graft.BpeDepthProbe` and re-commit if the deep trainer
  * changes.
  */
class BpeDepthProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/bpe_depth_probe.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("depth artifact exists, clears the 4096-rule floor, hard checks held") {
    assert(java.nio.file.Files.exists(path),
      s"$path missing — run graft.BpeDepthProbe and commit the artifact")
    assert(root.get("rules").asLong() >= root.get("min_rules").asLong() &&
      root.get("min_rules").asLong() >= 4096L,
      s"only ${root.get("rules")} rules — the depth regime was not reached")
    // the trainer hard-fails in-run if any pass's batched fold diverges
    // from the closed-form site counts; a written artifact implies every
    // pass held (trainDeepTrace requires minMerges and the per-pass law)
    assert(root.get("hard_check").asText() == "passed")
  }

  test("per-pass wall is flat: cost scales with passes, not learned rules") {
    val walls = root.get("wall_per_pass")
    val passes = root.get("passes").asInt()
    assert(walls != null && walls.size() == passes,
      s"expected $passes per-pass wall samples")
    val times = (0 until walls.size()).map(walls.get(_).asDouble())
    val sorted = times.sorted
    val median =
      if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
    assert(times.max <= 3.0 * median,
      s"pass wall band broken: max ${times.max} > 3x median $median — " +
        "per-pass cost is growing with depth (or the box was loaded)")
    // and the LAST quarter of passes is not systematically slower than
    // the first quarter — the specific signature of depth-dependent cost
    val quarter = passes / 4
    val head = times.take(quarter).sum / quarter
    val tail = times.takeRight(quarter).sum / quarter
    assert(tail <= 2.0 * head,
      s"late passes average ${tail}s vs early ${head}s — cost grows with depth")
  }

  test("rules per pass stay near the batch width on a wide vocabulary") {
    val rpp = root.get("rules_per_pass")
    assert(rpp != null && rpp.size() == root.get("passes").asInt())
    val counts = (0 until rpp.size()).map(rpp.get(_).asInt())
    assert(counts.forall(_ >= 1), "a pass learned zero rules")
    // the chain-greedy scan keeps finding big disjoint batches pass
    // after pass — no collapse as the vocabulary deepens (measured
    // plateau ≈ 120 of batch 256; floor at a quarter batch)
    assert(counts.min >= 64,
      s"rules-per-pass collapsed: min ${counts.min}, max ${counts.max}")
  }
}
