package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates bench/cluster_probe_x20.json — the real multi-executor receipt
  * (r13–r16 verdicts' carried "local[n] only" caveat): a 2-worker Spark
  * STANDALONE cluster (separate executor JVMs, serialized shuffle blocks
  * over loopback netty, per-executor broadcast decode) must produce
  * bit-identical answers to local[16] on the ×20 embedding-LSH corpus and
  * the corpus cleaner, at comparable wall. Re-run graft.ClusterProbe
  * (cluster setup in its scaladoc) after touching LshBlocking,
  * SimilarityQueries' banding, or CorpusPipeline.
  */
class ClusterProbeArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/cluster_probe_x20.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  private val cells = Seq("emb_lsh_x20", "corpus_clean")

  test("artifact exists, from a genuinely multi-executor run") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    assert(root.get("master").asText().startsWith("spark://"),
      "probe did not run against a standalone master")
    assert(root.get("cluster_executors").asInt() >= 2,
      s"only ${root.get("cluster_executors")} executor(s) — not a multi-JVM run")
  }

  test("cluster answers are bit-identical to local, at comparable wall") {
    cells.foreach { c =>
      val n = root.get(c)
      assert(n != null, s"$c missing from artifact")
      assert(n.get("match").asBoolean(),
        s"$c: cluster checksum ${n.get("checksum_cluster")} != local ${n.get("checksum_local")}")
      val ratio = n.get("cluster_sec").asDouble() / n.get("local_sec").asDouble()
      assert(ratio < 3.0,
        s"$c: cluster ${n.get("cluster_sec")} s vs local ${n.get("local_sec")} s — " +
          "real shuffle serialization should not triple the wall on one box")
    }
  }
}
