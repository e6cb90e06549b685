package graft.pipeline

import graft.SparkSpec

/** Laws of q_influence_scores: the whole attribution pipeline — features,
  * train/val split, train-split ridge solve, residuals, the validation
  * gradient, both descales, the product, and both top-25 rankings — is
  * replayed in plain Scala from the raw parquet (sharing only the pinned
  * Gaussian-elimination solver, which LinearProbeSpec gates separately),
  * and must match the gate bit-for-bit. Plus the sign laws the labels
  * encode.
  */
class InfluenceSpec extends SparkSpec {

  private val d = sf("sf0.001")
  private val Q = 10000L
  private val WScale = 1L << 30

  private lazy val gate =
    graft.SparkEntry.queries("q_influence_scores")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val replay: (Seq[(String, Long, Long, Long)]) = {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val clusters = graft.SparkEntry.queries("q_kmeans_assign")(spark, d)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val x: Map[Long, Array[Long]] = vecs.map { case (id, v) =>
      id -> (Array(Q) ++ v.map(f => math.round(f.toDouble * Q)))
    }.toMap
    val y: Map[Long, Long] =
      vecs.map { case (id, _) => id -> (if (clusters(id) == 0L) 1L else -1L) }.toMap
    val isVal = (id: Long) => id % 10 == 3
    val trainIds = vecs.map(_._1).filterNot(isVal)
    val valIds = vecs.map(_._1).filter(isVal)

    // ridge solve on the train split (the gate's Gramian + solver algebra)
    val d1 = 65
    // the gate's Gramian/moment cells are EXACT BIGINT sums converted to
    // double once — accumulate longs here too, or double rounding drifts
    val aL = Array.ofDim[Long](d1, d1)
    val bL = Array.ofDim[Long](d1)
    trainIds.foreach { id =>
      val xi = x(id)
      for (i <- 0 until d1; j <- i until d1)
        aL(i)(j) += xi(i) * xi(j)
      for (i <- 0 until d1) bL(i) += y(id) * xi(i)
    }
    val a = Array.tabulate(d1, d1)((i, j) =>
      (if (i <= j) aL(i)(j) else aL(j)(i)).toDouble)
    val b = bL.map(_.toDouble)
    val alpha = (0 until d1).map(i => a(i)(i)).sum / d1 * 1e-6
    (0 until d1).foreach(i => a(i)(i) += alpha)
    val w = LinearProbeQueries.solve(a, b)
    val wq = w.map(v => math.floor(v * WScale + 0.5).toLong)

    def s(id: Long): Long = x(id).zip(wq).map { case (xi, wi) => xi * wi }.sum
    def r(id: Long): Long = s(id) - y(id) * WScale

    val g = Array.ofDim[Long](d1)
    valIds.foreach { id =>
      val xi = x(id); val ri = r(id)
      for (i <- 0 until d1) g(i) += ri * xi(i)
    }
    val gs = g.map(_ / WScale)
    def infl(id: Long): Long = {
      val xg = x(id).zip(gs).map { case (xi, gi) => xi * gi }.sum
      (r(id) / 4096L) * (xg / 4096L)
    }
    val scoredTrain = trainIds.map(id => id -> infl(id))
    val help = scoredTrain.sortBy { case (id, v) => (-v, id) }.take(25)
      .zipWithIndex.map { case ((id, v), i) => ("helpful", (i + 1).toLong, id, v) }
    val harm = scoredTrain.sortBy { case (id, v) => (v, id) }.take(25)
      .zipWithIndex.map { case ((id, v), i) => ("harmful", (i + 1).toLong, id, v) }
    (harm ++ help).sortBy(t => (t._1, t._2))
  }

  test("both rankings equal the independent Scala replay bit-for-bit") {
    assert(gate.toSeq.sortBy(t => (t._1, t._2)) == replay)
  }

  test("sign laws: helpful list is non-increasing, harmful non-decreasing, and they do not cross") {
    val help = gate.filter(_._1 == "helpful").sortBy(_._2).map(_._4)
    val harm = gate.filter(_._1 == "harmful").sortBy(_._2).map(_._4)
    assert(help.size == 25 && harm.size == 25)
    assert(help.zip(help.tail).forall { case (a, b) => a >= b })
    assert(harm.zip(harm.tail).forall { case (a, b) => a <= b })
    assert(help.head >= harm.head)
  }
}
