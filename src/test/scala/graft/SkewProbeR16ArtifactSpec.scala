package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the committed round-16 skew-probe artifact
  * (`bench/skew_probe_r16.json`): each axis's skew is REAL (the hub
  * actually dominates the graph; the seed source actually floods hop 0)
  * and the hop map matched the independent BFS exactly on both.
  */
class SkewProbeR16ArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/skew_probe_r16.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("artifact exists and each axis's skew is real") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    val hub = root.get("hub_frontier")
    // the near-duplicate blob must collapse the graph onto one hub
    assert(hub.get("max_degree").asInt() > hub.get("n").asInt() / 2,
      "no hub emerged from the near-duplicate blob")
    // and the frontier must actually explode: one BFS round carries the
    // bulk of the corpus
    val hops = hub.get("hops")
    val maxRound = Seq("1", "2", "3").flatMap(h => Option(hops.get(h)))
      .map(_.asInt()).max
    assert(maxRound > hub.get("n").asInt() / 2,
      s"no frontier explosion: $hops")
    val seed = root.get("seed_source")
    assert(seed.get("seeds").asInt() >= seed.get("n").asInt() * 45 / 100,
      "seed source does not flood hop 0")
  }

  test("hop-map exactness preserved under both skew axes") {
    Seq("hub_frontier", "seed_source").foreach { axis =>
      assert(root.get(axis).get("diffs").asInt() == 0,
        s"$axis drifted from the independent BFS")
    }
  }
}
