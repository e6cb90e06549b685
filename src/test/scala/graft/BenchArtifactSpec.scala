package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards over the COMMITTED bench artifact (`bench/last_run.json`) — the
  * r8/r9 verdicts' asks made into checks instead of promises:
  *
  *  1. the artifact must cover the full registry (`n_queries` ==
  *     |SparkEntry.queries|, no `failed` entries) — a partial or stale
  *     artifact read as "the suite number" is how a 6-query regression
  *     shipped in a round whose docs read all-green;
  *  2. the corpus-clean family's rep scatter must be bounded (max rep ≤ 2×
  *     median per query) — the r8 "CC load tail" forensics closed the
  *     spill/plan question, and this pins the measurement discipline so a
  *     pathological rep can't hide inside a committed median.
  *
  * The spec reads the artifact at the REPO path, so it gates what's
  * committed (or about to be), not a scratch run. Parsing rides Jackson,
  * which Spark already ships.
  */
class BenchArtifactSpec extends AnyFunSuite {
  private val path = java.nio.file.Paths.get("bench/last_run.json")

  private lazy val root = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(java.nio.file.Files.readAllBytes(path))
  }

  test("bench artifact exists and covers the full registry with no failures") {
    assert(java.nio.file.Files.exists(path), s"$path missing")
    val n = root.get("n_queries").asInt(-1)
    val registered = SparkEntry.queries.size
    assert(n == registered,
      s"bench artifact covers $n queries, registry has $registered — rerun graft.Bench and commit")
    val failed = root.get("failed")
    assert(failed != null && failed.size() == 0,
      s"bench artifact records failed queries: $failed")
  }

  test("corpus-clean family rep scatter is bounded (max rep <= 2x median)") {
    val reps = root.get("reps_detail")
    val family = Seq("q_corpus_clean", "q_corpus_clean_cc", "q_corpus_funnel")
    family.foreach { q =>
      val arr = reps.get(q)
      assert(arr != null && arr.size() >= 3, s"$q missing from reps_detail")
      val times = (0 until arr.size()).map(arr.get(_).asDouble())
      val sorted = times.sorted
      val median =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
      assert(times.max <= 2.0 * median,
        s"$q reps $times: max ${times.max} > 2x median $median — " +
          "load tail is back (or the box was dirty when the artifact was made); " +
          "rerun graft.Bench at idle before committing")
    }
  }
}
