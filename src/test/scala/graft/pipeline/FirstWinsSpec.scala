package graft.pipeline

import graft.SparkSpec

/** Laws of q_dedup_first_wins: the wave-resolved keep set equals a strict
  * sequential replay of the online service (process docs in arrival
  * order, keep iff no KEPT earlier near-dup), the result is a maximal
  * independent set with the first-wins witness property, and sf0.01
  * chains resolve inside the oracle's unroll depth.
  */
class FirstWinsSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val gate =
    graft.SparkEntry.queries("q_dedup_first_wins")(spark, d)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))

  /** Same τ=0.8 exact-Jaccard graph, from the registered pair gate. */
  private lazy val pairs: Seq[(Long, Long)] =
    graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private lazy val sequentialKept: Map[Long, Boolean] = {
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val earlier: Map[Long, Seq[Long]] =
      pairs.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1) }
    val kept = scala.collection.mutable.Map.empty[Long, Boolean]
    verts.foreach { v =>
      kept(v) = !earlier.getOrElse(v, Nil).exists(kept(_))
    }
    kept.toMap
  }

  test("the wave resolution equals the strict sequential online replay") {
    val got = gate.map(r => r._1 -> r._2).toMap
    assert(got == sequentialKept,
      s"diff=${got.toSet.diff(sequentialKept.toSet)}")
  }

  test("kept docs form a maximal independent set with first-wins witnesses") {
    val kept = gate.filter(_._2).map(_._1).toSet
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"adjacent docs $a,$b both kept")
    }
    gate.filterNot(_._2).foreach { case (v, _, _) =>
      val witness = pairs.exists { case (a, b) => b == v && kept(a) }
      assert(witness, s"dropped doc $v has no KEPT earlier neighbor")
    }
  }

  test("sf0.01 chains resolve inside the oracle's 8-wave unroll") {
    assert(gate.map(_._3).max <= 8)
  }
}
