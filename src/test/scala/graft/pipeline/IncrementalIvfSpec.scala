package graft.pipeline

import graft.SparkSpec

/** Laws of incremental IVF maintenance (q_ann_ivf_incremental): the gate
  * equals an independent plain-Scala replay (old-half Lloyd → frozen
  * assignment → probe → integer re-rank) bit-for-bit, fresh arrivals are
  * immediately searchable, the index covers every vector, and the
  * honesty receipt — recall vs exact top-10 and vs a FULL RETRAIN — is
  * measured: not retraining costs nothing here (the probe budget
  * nprobe=2 of k=8, not centroid drift, binds recall on this corpus —
  * the same isotropy limit MatryoshkaSpec documents).
  */
class IncrementalIvfSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private lazy val vecs: Array[Array[Long]] = {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .sortBy(_.getLong(0))
    rows.map(_.getSeq[Float](1).map(v =>
      BigDecimal(v.toDouble * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong + 10000L).toArray)
  }

  private def l2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** 2-round integer Lloyd (init vec 0..7) over `idx`; returns ×100
    * centroids KEYED BY CLUSTER ID, empty clusters dropped — the gate's
    * round-2 centroid frame is a GROUP BY over round-1 assignments, so a
    * cluster no vector chose has no row (and the oracle agrees); keeping
    * it at its init centroid here would diverge on a corpus where a
    * round-1 cluster empties.
    */
  private def lloyd(idx: Range): Map[Int, Array[Long]] = {
    val c0 = (0 until 8).map(k => vecs(k).map(_ * 100L).toArray).toArray
    def assign(c: Array[Array[Long]], i: Int): Int =
      (0 until 8).minBy(k => (l2(vecs(i).map(_ * 100L), c(k)), k))
    val a1 = idx.map(i => i -> assign(c0, i)).toMap
    (0 until 8).flatMap { k =>
      val members = idx.filter(a1(_) == k)
      if (members.isEmpty) None
      else Some(k -> Array.tabulate(64) { j =>
        members.map(i => vecs(i)(j)).sum * 100L / members.size
      })
    }.toMap
  }

  /** nprobe=2 search for vec 42 against the given centroids (only the
    * clusters present in the map participate — the gate's semantics).
    */
  private def search(c: Map[Int, Array[Long]]): Seq[(Long, Boolean, Long)] = {
    val n = vecs.length
    val ks = c.keys.toSeq.sorted
    def assign(i: Int): Int =
      ks.minBy(k => (l2(vecs(i).map(_ * 100L), c(k)), k))
    val qd = ks.map(k => (l2(vecs(42).map(_ * 100L), c(k)), k)).sorted
    val probed = qd.take(2).map(_._2).toSet
    (0 until n).filter(i => i != 42 && probed.contains(assign(i)))
      .map(i => (i.toLong, i >= n / 2, l2(vecs(i), vecs(42))))
      .sortBy { case (id, _, dist) => (dist, id) }
      .take(10)
  }

  private lazy val incremental = search(lloyd(0 until vecs.length / 2))

  private lazy val gate: Seq[(Long, Boolean, Long)] =
    graft.SparkEntry.queries("q_ann_ivf_incremental")(spark, d).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq

  test("gate equals the independent Scala replay bit-for-bit") {
    assert(gate == incremental)
  }

  test("fresh arrivals are immediately searchable") {
    assert(gate.exists(_._2),
      s"no incrementally-added vector reached the top-10: $gate")
  }

  test("honesty receipt: incremental recall vs exact and vs full retrain") {
    val n = vecs.length
    val exact = (0 until n).filter(_ != 42)
      .map(i => (l2(vecs(i), vecs(42)), i.toLong))
      .sorted.take(10).map(_._2).toSet
    val incHits = incremental.map(_._1).count(exact)
    val retrainHits = search(lloyd(0 until n)).map(_._1).count(exact)
    // the probe budget (nprobe=2 of k=8), not centroid drift, binds
    // recall on this corpus: freezing the old-snapshot centroids must
    // not cost more than one exact neighbor vs retraining
    assert(incHits >= retrainHits - 1,
      s"incremental $incHits vs retrain $retrainHits exact hits")
    assert(incHits >= 3, s"incremental recall ${incHits / 10.0} collapsed")
  }
}
