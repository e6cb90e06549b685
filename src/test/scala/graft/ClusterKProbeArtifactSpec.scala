package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate over the COMMITTED cluster-k probe artifact
  * (`bench/cluster_k_probe_x10.json`, written by [[ClusterKProbe]] on
  * target/sf1): the k ∝ n contract of the cluster-blocked pair families,
  * now COMPOSED with the r14 IVF multi-probe face — finer clustering
  * collapses the Σ|c|² pair budget, and the second probe recovers the
  * boundary rows the finer clustering would otherwise hide. Re-run
  * `graft.ClusterKProbe` and re-commit if kmeans blocking or the
  * hard-negative faces change.
  */
class ClusterKProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/cluster_k_probe_x10.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("k ∝ n collapses the pair budget and the wall-clock") {
    assert(java.nio.file.Files.exists(path),
      s"$path missing — run graft.ClusterKProbe and commit the artifact")
    assert(root.get("k64").get("pair_budget").asLong() * 4 <
      root.get("k8").get("pair_budget").asLong(),
      "k=64 did not collapse the candidate budget vs pinned k=8")
    assert(root.get("k64").get("secs").asDouble() <
      root.get("k8").get("secs").asDouble())
  }

  test("IVF multi-probe recovers the finer clustering's boundary rows") {
    // pinned k=64 loses rows to cluster boundaries; nprobe=2 at the SAME
    // k recovers the pinned k=8 face's full row count at a fraction of
    // its cost — the production composition (k ∝ n + multi-probe)
    val pinnedK8Rows = root.get("k8").get("rows").asLong()
    assert(root.get("k64").get("rows").asLong() < pinnedK8Rows,
      "vacuous: finer clustering lost no rows on this corpus")
    assert(root.get("ivf_k64").get("rows").asLong() >= pinnedK8Rows,
      "nprobe=2 at k=64 failed to recover the boundary rows")
    assert(root.get("ivf_k64").get("secs").asDouble() * 2 <
      root.get("k8").get("secs").asDouble(),
      "the composed face is not substantially cheaper than pinned k=8")
  }
}
