package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of q_triplet_mining: each anchor's positive/negative equal an
  * independent brute-force argmax over the registered cluster
  * assignments (collected and replayed in Scala), the positive shares
  * the anchor's cluster while the negative never does, and the margin is
  * the exact integer difference.
  */
class TripletSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val gate =
    graft.SparkEntry.queries("q_triplet_mining")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val clusters: Map[Long, Long] =
    graft.SparkEntry.queries("q_kmeans_assign")(spark, d)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap

  private def cos9(a: Array[Float], b: Array[Float]): Long = {
    var dp, na, nb = 0.0
    for (i <- a.indices) {
      dp += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    math.round(dp / (math.sqrt(na) * math.sqrt(nb)) * 1e9)
  }

  test("positives and hard negatives equal the brute-force argmax per anchor") {
    val ids = vecs.keys.toSeq.sorted
    val anchors = ids.filter(id => id % 25 == 0 && id < 500)
    val expected = anchors.map { aid =>
      val scored = ids.filter(_ != aid)
        .map(id => (id, clusters(id), cos9(vecs(id), vecs(aid))))
      def best(p: ((Long, Long, Long)) => Boolean) =
        scored.filter(p).maxBy { case (id, _, c) => (c, -id) }
      val (pid, _, pc) = best(_._2 == clusters(aid))
      val (nid, _, nc) = best(_._2 != clusters(aid))
      (aid, pid, pc, nid, nc, pc - nc)
    }
    assert(gate.toSeq.sortBy(_._1) == expected)
  }

  test("positive shares the anchor cluster; negative never does; margin is exact") {
    gate.foreach { case (aid, pid, pc, nid, nc, margin) =>
      assert(clusters(pid) == clusters(aid))
      assert(clusters(nid) != clusters(aid))
      assert(margin == pc - nc)
    }
  }
}
