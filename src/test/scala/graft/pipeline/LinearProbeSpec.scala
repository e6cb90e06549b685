package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the closed-form ridge probe (q_linear_probe): the confusion
  * matrix equals an independent plain-Scala pipeline (Gramian, moment,
  * ridge solve, quantize, score) bit-for-bit, the solved weights satisfy
  * the normal equations, and the accuracy receipt holds.
  */
class LinearProbeSpec extends SparkSpec {

  private val d = sf("sf0.001")

  /** (y, x[0..64]) with the gate's quantization and target. */
  private lazy val data: Seq[(Long, Array[Long])] = {
    val y = SimilarityQueries.kmeansAssignments(
        spark.read.parquet(s"$d/embeddings.parquet"), k = 8)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> (if (r.getInt(1) == 0) 1L else -1L)).toMap
    spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val xs = 10000L +: r.getSeq[Float](1).map(v =>
          BigDecimal(v.toDouble * 10000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
        (y(r.getLong(0)), xs)
      }.toSeq
  }

  private def gramMoment: (Array[Array[Double]], Array[Double]) = {
    val a = Array.ofDim[Double](65, 65)
    val b = Array.ofDim[Double](65)
    data.foreach { case (y, xs) =>
      for (i <- 0 until 65) {
        b(i) += (y * xs(i)).toDouble
        for (j <- i until 65) a(i)(j) += (xs(i) * xs(j)).toDouble
      }
    }
    for (i <- 0 until 65; j <- 0 until i) a(i)(j) = a(j)(i)
    (a, b)
  }

  private lazy val replayW: Array[Long] = {
    val (a, b) = gramMoment
    val alpha = (0 until 65).map(i => a(i)(i)).sum / 65 * 1e-6
    (0 until 65).foreach(i => a(i)(i) += alpha)
    val w = LinearProbeQueries.solve(a, b)
    w.map(v => math.floor(v * (1L << 30) + 0.5).toLong)
  }

  private lazy val gate: Seq[(Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_linear_probe")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("gate confusion equals the independent Scala pipeline bit-for-bit") {
    val cells = data.map { case (y, xs) =>
      val s = xs.zip(replayW).map { case (x, w) => x * w }.sum
      (y, if (s > 0) 1L else -1L, s)
    }.groupBy { case (y, yh, _) => (y, yh) }
      .map { case ((y, yh), rows) =>
        (y, yh, rows.size.toLong, rows.map(_._3).sum)
      }.toSeq.sortBy(c => (c._1, c._2))
    assert(gate == cells)
  }

  test("solved weights satisfy the ridge normal equations") {
    val (a, b) = gramMoment
    val alpha = (0 until 65).map(i => a(i)(i)).sum / 65 * 1e-6
    (0 until 65).foreach(i => a(i)(i) += alpha)
    val w = replayW.map(_.toDouble / (1L << 30).toDouble)
    val resid = (0 until 65).map { i =>
      val r = (0 until 65).map(j => a(i)(j) * w(j)).sum - b(i)
      r * r
    }.sum
    val bNorm = b.map(v => v * v).sum
    assert(resid / bNorm < 1e-9,
      s"relative residual ${math.sqrt(resid / bNorm)} — solve drifted")
  }

  test("accuracy receipt: the closed-form probe recovers the cluster structure") {
    val errors = gate.filter { case (y, yh, _, _) => y != yh }.map(_._3).sum
    val majority = data.count(_._1 == 1L).toLong
    assert(errors < majority,
      s"errors $errors vs majority baseline $majority — the probe did not learn")
  }
}
