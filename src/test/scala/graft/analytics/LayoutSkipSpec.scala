package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Properties of the Bloom file-skipping index (q_bloom_fileskip) that the
  * cross-engine hash gate cannot state on its own: the index is a sound
  * pruning oracle (never a false negative — skipping a file the value
  * lives in would silently lose rows), and it actually prunes (the absent
  * probe key must skip files, or the index is dead weight). The consistent
  * cut's safe-watermark law rides along: the cut is the minimum of the
  * per-shard high-water marks, so at least one shard sits exactly at the
  * cut (several, when high-water marks tie at seconds granularity) and
  * every lag is that shard's hwm minus the cut.
  */
class LayoutSkipSpec extends SparkSpec {

  test("bloom fileskip: no false negatives, and the absent key skips files") {
    val rows = SparkEntry.queries("q_bloom_fileskip")(spark, sf()).collect()
    assert(rows.length == 32 * 4, s"expected 32 files x 4 probes, got ${rows.length}")
    val fn = rows.filter(r => r.getBoolean(5) && !r.getBoolean(4))
    assert(fn.isEmpty,
      s"false negatives (truly_contains but bloom says skip): ${fn.mkString(", ")}")
    // the absent key (999999999) must be prunable somewhere: with ~2%
    // fill at sf0.001 essentially every file is skipped, and even a
    // saturated filter may only degrade toward read-everything
    val absent = rows.filter(_.getLong(1) == 999999999L)
    assert(absent.forall(r => !r.getBoolean(5)), "absent key claims containment")
    assert(absent.count(!_.getBoolean(4)) > 0,
      "absent probe key skipped zero files — the index never prunes")
  }

  test("consistent cut: min-of-max watermark, one zero-lag shard, applied <= hwm") {
    val rows = SparkEntry.queries("q_cdc_consistent_cut")(spark, sf()).collect()
    assert(rows.length == 4)
    val cut = rows.map(_.getLong(2)).distinct
    assert(cut.length == 1, s"cut_sec differs across shards: ${cut.mkString(",")}")
    assert(cut.head == rows.map(_.getLong(1)).min, "cut is not min of shard hwms")
    assert(rows.count(_.getLong(3) == 0L) >= 1, "no shard sits exactly at the cut")
    assert(rows.forall(r => r.getLong(3) == r.getLong(1) - cut.head), "lag law broken")
  }

  test("chunked bootstrap: reconciled state equals truth, both sources exercised") {
    val rows = SparkEntry.queries("q_cdc_chunked_bootstrap")(spark, sf()).collect()
    assert(rows.length == 8)
    // the whole point: every chunk's reconciled state matches the direct
    // latest-wins snapshot key-for-key
    assert(rows.forall(r => r.getLong(6) == r.getLong(2)),
      s"chunked state diverges from truth: ${rows.mkString("; ")}")
    // the scenario is non-trivial only if some keys finalize from the chunk
    // row AND some get overridden by the stream
    assert(rows.map(_.getLong(4)).sum > 0, "stream never overrode a chunk row")
    assert(rows.map(_.getLong(5)).sum > 0, "no key finalized from its chunk row")
    // later chunks snapshot later -> monotone watermarks
    assert(rows.sortBy(_.getLong(0)).map(_.getLong(1)).sliding(2).forall(p => p(0) < p(1)))
  }
}
