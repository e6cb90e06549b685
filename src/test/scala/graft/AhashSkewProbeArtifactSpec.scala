package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates bench/ahash_skew_probe.json — the perceptual-hash face's
  * adversarial-skew receipts. Re-run graft.AhashSkewProbe after touching
  * Multimodal.ahashPairs, LshBlocking's guards, or ConnectedComponents.
  */
class AhashSkewProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/ahash_skew_probe.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("all-identical axis: star guard fires, n-1 Hamming-0 pairs, one n-cluster") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    val a = root.get("all_identical")
    val n = a.get("n").asLong()
    assert(a.get("pairs").asLong() == n - 1,
      "pair generation did not collapse to the star — the guard regressed")
    assert(a.get("ham0").asLong() == n - 1)
    assert(a.get("star_to_0").asLong() == n - 1)
    assert(a.get("hot_cluster").asLong() == n,
      "the CC action face lost members of the duplicate cluster")
    assert(a.get("pair_secs").asDouble() < 120.0)
  }

  test("half-identical axis: the hot cluster is exactly the identical half, no leakage") {
    val a = root.get("half_identical")
    val n = a.get("n").asLong()
    assert(a.get("star_to_0").asLong() == n / 2 - 1)
    assert(a.get("hot_cluster").asLong() == n / 2)
    // organic near-dup-dense half: pair volume is large by construction —
    // the receipt is that generation stays bounded in time, not count
    assert(a.get("pair_secs").asDouble() < 120.0)
    assert(a.get("cc_secs").asDouble() < 120.0)
  }
}
