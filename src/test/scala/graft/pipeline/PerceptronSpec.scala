package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the batch-perceptron linear probe (q_train_perceptron): the
  * gated trace equals an independent plain-Scala training replay
  * bit-for-bit, round 1 misclassifies everything (w = 0, zero margins),
  * and the pocket-rule receipt — the best round's error is far below the
  * majority baseline, i.e. the probe actually recovers the cluster
  * structure a linear model is supposed to recover.
  */
class PerceptronSpec extends SparkSpec {

  private val d = sf("sf0.001")

  /** (vec_id, y, x[0..64]) with the gate's quantization and target. */
  private lazy val data: Seq[(Long, Long, Array[Long])] = {
    val y = SimilarityQueries.kmeansAssignments(
        spark.read.parquet(s"$d/embeddings.parquet"), k = 8)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> (if (r.getInt(1) == 0) 1L else -1L)).toMap
    spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val id = r.getLong(0)
        val xs = 10000L +: r.getSeq[Float](1).map(v =>
          BigDecimal(v.toDouble * 10000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
        (id, y(id), xs)
      }.toSeq
  }

  /** Independent batch-perceptron replay with the gate's update law. */
  private def replay(rounds: Int): Seq[(Long, Long, Long, Long)] = {
    val w = Array.fill(65)(0L)
    (1 to rounds).map { r =>
      val mis = data.filter { case (_, y, xs) =>
        y * xs.zip(w).map { case (x, wv) => x * wv }.sum <= 0
      }
      mis.foreach { case (_, y, xs) =>
        (0 until 65).foreach(i => w(i) += y * xs(i))
      }
      (r.toLong, mis.size.toLong, w.map(math.abs).sum,
        w.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum)
    }
  }

  private lazy val gate: Seq[(Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_train_perceptron")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("gated trace equals the independent Scala replay bit-for-bit") {
    assert(gate == replay(PerceptronQueries.Rounds))
  }

  test("round 1 misclassifies every vector (zero weights, zero margins)") {
    assert(gate.head._2 == data.size.toLong)
  }

  test("pocket receipt: best round beats the majority baseline decisively") {
    val majority = data.count(_._2 == 1L).toLong // predict-all-negative errors
    val best = gate.map(_._2).min
    assert(best * 3 < majority,
      s"best n_mis $best vs majority baseline $majority — the probe did not learn")
  }
}
