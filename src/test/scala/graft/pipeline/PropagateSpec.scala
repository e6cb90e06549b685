package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of quality-taint propagation (q_quality_propagate): the gated
  * hop-distance map equals an independent plain-Scala BFS over an
  * independently built kNN graph, hops are MINIMAL distances (no taint
  * arrives late), and the frontier structure is non-degenerate.
  */
class PropagateSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private lazy val gate: Map[Long, (String, Long)] =
    graft.SparkEntry.queries("q_quality_propagate")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  /** Independent seed rule replay in plain Scala. */
  private lazy val seeds: Set[Long] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else {
          val n = toks.length.toLong
          val mx = toks.groupBy(identity).values.map(_.size).max.toLong
          val g2 = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
          val pass1 = 100 * mx > 11 * n
          val pass2 = g2.nonEmpty && {
            val mx2 = g2.groupBy(identity).values.map(_.size).max.toLong
            100 * mx2 > 6 * g2.size.toLong
          }
          if (pass1 && pass2) Some(r.getLong(0)) else None
        }
      }.toSet

  /** Independent kNN graph: exact cosine in Scala doubles, ROUND 9. */
  private lazy val adjacency: Map[Long, Set[Long]] = {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): BigDecimal = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dp / (na * nb)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val kn = vecs.flatMap { case (id, v) =>
      vecs.filter(_._1 != id)
        .map { case (nb, w) => (cos(v, w), nb) }
        .sortBy { case (c, nb) => (-c, nb) }
        .take(3).map { case (_, nb) => (id, nb) }
    }
    val und = kn ++ kn.map { case (a, b) => (b, a) }
    und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }

  /** Independent BFS from the seeds, 3 hops. */
  private lazy val replay: Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adjacency.getOrElse(_, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("gated hop-distance map equals the independent BFS replay") {
    assert(gate.view.mapValues(_._2).toMap == replay)
  }

  test("hops are minimal: every non-seed's hop is 1 + min over neighbors") {
    gate.foreach { case (id, (_, hop)) =>
      if (hop > 0) {
        val best = adjacency.getOrElse(id, Set.empty)
          .flatMap(n => gate.get(n).map(_._2)).min
        assert(hop == best + 1, s"doc $id hop $hop vs best neighbor $best")
      }
    }
  }

  test("the frontier structure is non-degenerate") {
    val byHop = gate.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byHop.getOrElse(0L, 0) > 0 && byHop.getOrElse(1L, 0) > 0 &&
      byHop.getOrElse(2L, 0) > 0,
      s"propagation collapsed to a trivial frontier: $byHop")
  }

  // ----- the ANN-composed face (q_quality_propagate_ann) ----------------

  private lazy val gateAnn: Map[Long, (String, Long)] =
    graft.SparkEntry.queries("q_quality_propagate_ann")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("ANN face: seeds are identical to the exact face (hop 0 is graph-free)") {
    assert(gateAnn.collect { case (id, (_, 0L)) => id }.toSet ==
      gate.collect { case (id, (_, 0L)) => id }.toSet)
  }

  test("ANN face: hop-map agreement with the exact face stays high") {
    // the banded candidate generator misses a true top-3 neighbor with
    // the banding curve's probability, so the two hop maps differ only
    // where an edge swap moved a doc one hop — measured 0.90 at sf0.001
    // and 0.92 at sf0.01; 0.85 is the regression floor, and the REACH
    // (how much of the corpus the taint finds at all) must match ~fully
    val docs = gate.keySet ++ gateAnn.keySet
    val agree = docs.count(id => gate.get(id).map(_._2) == gateAnn.get(id).map(_._2))
    assert(agree.toDouble / docs.size >= 0.85,
      s"hop-map agreement collapsed: $agree/${docs.size}")
    assert(gateAnn.size >= (gate.size * 95) / 100,
      s"ANN reach ${gateAnn.size} vs exact ${gate.size}")
  }

  test("ANN face plan audit: no all-pairs frame, no corpus-sized broadcast") {
    // the DIRECTED kNN build (the frame the exact face computes by
    // crossJoin(broadcast(embeddings))) must be keyed joins end to end:
    // band-bucket equi-join over bare ids, vec_id-keyed re-score joins
    // with no broadcast hint, bounded kminBy top-k
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val plan = PropagateQueries.annDirectedKnn(e)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
    // the ONLY nested-loop joins are the skew guard's bucket-size vs
    // 1-ROW mean comparisons — never a pairing of two corpus frames
    // (the exact face's crossJoin(broadcast(embeddings)) shape)
    val bnlj = "BroadcastNestedLoopJoin [^,]+, [^,]+, \\(([^\\n]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(bnlj.forall(c => c.contains("_mean") && c.contains("_bsz")),
      s"non-skew-guard nested-loop join:\n$bnlj\n${plan.take(4000)}")
    assert(plan.contains("partial_kminby"), plan.take(4000))
  }
}
