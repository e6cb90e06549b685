package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the 1-bit binary-quantization ANN face (q_ann_binary_hamming):
  * code packing, and the recall-vs-shortlist-depth oversampling curve the
  * operator's scaladoc quotes.
  */
class BinaryHammingSpec extends SparkSpec {

  private lazy val e =
    spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")

  test("binary codes pack 64 sign bits into two 32-bit words") {
    val codes = SimilarityQueries.binaryCodes(e).collect()
    assert(codes.length == e.count())
    // 32 bits per word: both words in [0, 2^32); the sign bit is never set
    codes.foreach { r =>
      val (w0, w1) = (r.getLong(1), r.getLong(2))
      assert(w0 >= 0L && w0 < (1L << 32), s"w0 out of range: $w0")
      assert(w1 >= 0L && w1 < (1L << 32), s"w1 out of range: $w1")
    }
    // replay one vector's code driver-side from the raw floats and the
    // per-dimension midrange thresholds
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val dims = vecs.values.head.length
    assert(dims == 64)
    val thr = (0 until dims).map { d =>
      val xs = vecs.values.map(_(d))
      (xs.min + xs.max) / 2
    }
    val probe = vecs.keys.min
    var (w0, w1) = (0L, 0L)
    (0 until dims).foreach { d =>
      if (vecs(probe)(d) > thr(d)) {
        if (d < 32) w0 |= 1L << d else w1 |= 1L << (d - 32)
      }
    }
    val got = codes.find(_.getLong(0) == probe).get
    assert((got.getLong(1), got.getLong(2)) == ((w0, w1)))
  }

  test("recall@10 tracks shortlist depth (the oversampling law)") {
    val n = e.count().toInt
    // depth = full corpus makes the pre-filter a no-op: exact baseline
    val exact = topSets(n)
    def recall(depth: Int): Double = {
      val got = topSets(depth)
      val per = exact.map { case (q, ids) => (ids & got(q)).size / 10.0 }
      per.sum / per.size
    }
    val r50 = recall(50)
    val r200 = recall(200)
    val r400 = recall(400)
    info(f"recall@10 by depth: 50 → $r50%.3f, 200 → $r200%.3f, 400 → $r400%.3f")
    assert(r50 <= r200 && r200 <= r400, "recall must be monotone in depth")
    assert(r200 >= 0.9, s"depth-200 recall $r200")
    assert(r400 >= 0.99, s"depth-400 recall $r400")
  }

  private def topSets(depth: Int): Map[Long, Set[Long]] =
    SimilarityQueries.binaryHammingTopK(e, depth)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
}
