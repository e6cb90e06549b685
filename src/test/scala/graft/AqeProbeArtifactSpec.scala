package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed AQE probe artifact (`bench/aqe_probe_r16.json`):
  * the cluster-sized partition setting is MEASURED to be safe — AQE
  * coalesces every post-shuffle read far below the configured 512, the
  * skewed join is actually split (skew=true in the final plan), and both
  * workloads return bit-identical results at partitions = 512 and 32 (the
  * partition-count invariance every operator here claims).
  */
class AqeProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/aqe_probe_r16.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("AQE coalesced the over-partitioned shuffle reads") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    val reads = root.get("aqe_reads")
    assert(reads.size() > 0, "no AQEShuffleRead observed")
    (0 until reads.size()).foreach { i =>
      assert(reads.get(i).asInt() < root.get("initial_partitions").asInt() / 4,
        s"read $i kept ${reads.get(i).asInt()} of 512 partitions — AQE inert")
    }
  }

  test("the skewed join was split and both workloads are partition-count invariant") {
    assert(root.get("skew_join_marked").asBoolean(), "OptimizeSkewedJoin never fired")
    assert(root.get("results_identical").asBoolean(),
      "feature collapse drifted across partition counts")
    assert(root.get("skew_results_identical").asBoolean(),
      "skew join drifted across partition counts")
  }
}
