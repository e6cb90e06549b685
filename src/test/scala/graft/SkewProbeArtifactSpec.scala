package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate over the COMMITTED adversarial-skew probe artifact
  * (`bench/skew_probe_x10.json`, written by [[ZipfSkewProbe]] — r11
  * verdict item 2): every earlier scale probe reported zero hot buckets,
  * i.e. the skew guards had never fired outside unit tests. This spec
  * pins the three claims the probe exists to make: the guards ACTIVATED
  * on a Zipf-named / boilerplate-doc / default-embedding corpus, the
  * salted fuzzy blocking stayed pair-for-pair EXACT against the unguarded
  * self-join under that skew, and the star guards preserved verified
  * dup-membership. Re-run `graft.ZipfSkewProbe` and re-commit if the
  * blocking code changes.
  */
class SkewProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/skew_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("skew probe artifact exists and every guard actually activated") {
    assert(java.nio.file.Files.exists(path),
      s"$path missing — run graft.ZipfSkewProbe and commit the artifact")
    val fuzzy = root.get("fuzzy")
    assert(fuzzy.get("variant_buckets_over_cell").asLong() > 0,
      "no variant bucket exceeded the salt cell — the salted guard never split a bucket")
    assert(fuzzy.get("max_bucket").asLong() > fuzzy.get("cell").asLong())
    assert(root.get("minhash").get("hot_buckets").asLong() > 0,
      "minhash star guard never fired")
    assert(root.get("embedding").get("hot_buckets").asLong() > 0,
      "RP-LSH star guard never fired")
  }

  test("salted fuzzy blocking is exact vs the unguarded self-join under skew") {
    assert(root.get("fuzzy").get("pair_set_diff").asLong() == 0,
      "salted pair set diverged from the unguarded self-join")
    assert(root.get("fuzzy").get("salted_pairs").asLong() ==
      root.get("fuzzy").get("unguarded_pairs").asLong())
  }

  test("star guards preserve verified dup-membership") {
    assert(root.get("minhash").get("membership_diff_x1").asLong() == 0)
    assert(root.get("embedding").get("membership_diff_x1").asLong() == 0)
    // non-vacuous: the planted families (3% of 5000 docs, 5% of 2000
    // vectors at ×1 — both above tagHot's minHot=64, so the star guard
    // really fired in the compared run) must be in the membership
    assert(root.get("minhash").get("members_x1").asLong() > 120)
    assert(root.get("embedding").get("members_x1").asLong() > 80)
  }

  test("hot reducer cell is bounded: salt cell pairs << worst unguarded bucket") {
    val fuzzy = root.get("fuzzy")
    val maxB = fuzzy.get("max_bucket").asLong()
    assert(fuzzy.get("max_cell_pairs").asLong() < maxB * (maxB - 1) / 2,
      "the guard's per-cell bound does not beat the unguarded hot bucket")
  }
}
