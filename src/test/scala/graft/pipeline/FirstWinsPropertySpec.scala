package graft.pipeline

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized law for the first-wins wave resolution: on ARBITRARY
  * order-DAG pair graphs (random edges, chains, diamonds, stars — not
  * just the dup-cluster shapes the corpus produces), the distributed
  * synchronous-wave answer must equal the strict sequential greedy, and
  * no vertex may resolve LATER than its longest order-ascending
  * dependency depth (a drop can resolve earlier — one kept neighbor
  * suffices before the longest chain finishes — but never later).
  */
class FirstWinsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val graphs: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 14L)
        b <- Gen.chooseNum(0L, 14L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    }.map(_.distinct)

  private def sequential(edges: List[(Long, Long)]): Map[Long, Boolean] = {
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val earlier = edges.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1) }
    val kept = scala.collection.mutable.Map.empty[Long, Boolean]
    verts.foreach(v => kept(v) = !earlier.getOrElse(v, Nil).exists(kept(_)))
    kept.toMap
  }

  /** Longest dependency chain ending at v (0 for no earlier neighbor) —
    * the minimal wave count a synchronous resolution can achieve.
    */
  private def depth(edges: List[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val earlier = edges.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1) }
    val d = scala.collection.mutable.Map.empty[Long, Long]
    verts.foreach { v =>
      d(v) = earlier.getOrElse(v, Nil).map(d(_) + 1).foldLeft(0L)(math.max)
    }
    d.toMap
  }

  test("wave resolution equals the sequential greedy on random order-DAGs (property)") {
    val prop = Prop.forAll(graphs) { edges =>
      edges.isEmpty || {
        val got = FirstWinsDedupQueries
          .resolveWaves(edges.toDF("e", "d"), maxRounds = 64)
          .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
        val exp = sequential(edges)
        val dep = depth(edges)
        got.map(r => r._1 -> r._2).toMap == exp &&
          got.forall { case (v, _, rnd) => rnd <= dep(v) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
