package graft.pipeline

import graft.SparkSpec

/** Laws of q_dedup_embedding_clusters: the cluster map equals an
  * independent union-find over the registered pair gate's output, the
  * survivor policy is exactly one minimum per cluster, and membership is
  * exactly the paired vertex set.
  */
class EmbeddingClusterSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val gate =
    graft.SparkEntry.queries("q_dedup_embedding_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  private lazy val pairs =
    graft.SparkEntry.queries("q_dedup_embedding_lsh")(spark, d)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private lazy val ufReps: Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("cluster assignments equal an independent union-find over the pair gate") {
    val got = gate.map(r => r._1 -> r._2).toMap
    assert(got == ufReps,
      s"missing=${ufReps.keySet.diff(got.keySet)} extra=${got.keySet.diff(ufReps.keySet)}")
  }

  test("exactly one survivor per cluster, and it is the minimum member") {
    val byCluster = gate.groupBy(_._2)
    byCluster.foreach { case (rep, members) =>
      val survivors = members.filter(_._3)
      assert(survivors.length == 1, s"cluster $rep has ${survivors.length} survivors")
      assert(survivors.head._1 == rep)
      assert(members.map(_._1).min == rep)
    }
  }
}
