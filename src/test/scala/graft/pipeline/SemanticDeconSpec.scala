package graft.pipeline

import graft.SparkSpec

/** Laws of q_decontaminate_semantic at sf0.01 (the gate's own fixture
  * scale): every planted verbatim leak is flagged through its copy, the
  * flagged set equals the EXACT brute-force contamination set (LSH
  * recall 1.0 on this corpus — identical vectors share all band keys,
  * and the organic pairs all collide too), and every emitted cosine
  * re-verifies above τ in an independent Scala recompute.
  */
class SemanticDeconSpec extends SparkSpec {

  private val d = sf("sf0.01")
  private val Tau = 0.42
  private val PlantBase = 1000000000L

  private lazy val gate =
    graft.SparkEntry.queries("q_decontaminate_semantic")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Sequential float→double cosine — the engines' arithmetic. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dp, na, nb = 0.0
    for (i <- a.indices) {
      dp += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val evalSet: Map[Long, Array[Float]] =
    vecs.collect { case (id, v) if id % 97 == 0 => id -> v } ++
      vecs.collect { case (id, v) if id % 50 == 0 && id % 97 != 0 =>
        (id + PlantBase) -> v
      }

  private lazy val corpus: Map[Long, Array[Float]] =
    vecs.filter { case (id, _) => id % 97 != 0 }

  /** Exact brute-force contamination: doc → hits above τ. */
  private lazy val exact: Map[Long, Seq[(Long, Double)]] =
    corpus.toSeq.flatMap { case (cid, cv) =>
      evalSet.toSeq.collect {
        case (eid, ev) if round9(cos(cv, ev)) >= Tau => (cid, eid, cos(cv, ev))
      }
    }.groupBy(_._1).map { case (cid, xs) =>
      cid -> xs.map(t => (t._2, t._3)).sortBy { case (eid, c) =>
        (-math.round(c * 1000000000L), eid)
      }
    }

  test("every planted verbatim leak is flagged through its exact copy") {
    val planted = corpus.keySet.filter(id => id % 50 == 0)
    val flagged = gate.map(r => r._1 -> r._3).toMap
    planted.foreach { id =>
      assert(flagged.contains(id), s"planted source $id not flagged")
      assert(flagged(id) == id + PlantBase,
        s"planted source $id top hit is ${flagged(id)}, not its copy")
    }
    gate.filter(r => planted.contains(r._1)).foreach { r =>
      assert(r._4 >= 999000000L, s"verbatim copy cosine ${r._4} not ~1.0")
    }
  }

  test("the flagged set equals the exact brute-force contamination set (recall 1.0 here)") {
    val got = gate.map(_._1).toSet
    assert(got == exact.keySet,
      s"missing=${exact.keySet.diff(got)} extra=${got.diff(exact.keySet)}")
    gate.foreach { case (cid, nHits, topEval, maxCos) =>
      val exp = exact(cid)
      assert(nHits == exp.size, s"doc $cid n_hits $nHits != ${exp.size}")
      assert(topEval == exp.head._1)
      assert(maxCos == math.round(exp.head._2 * 1000000000L))
    }
  }

  test("every emitted max cosine re-verifies above tau independently") {
    gate.foreach { case (cid, _, topEval, maxCos) =>
      val ev = evalSet(topEval)
      val c = cos(corpus(cid), ev)
      assert(round9(c) >= Tau)
      assert(math.abs(c * 1e9 - maxCos) <= 2.0, s"doc $cid cosine drift")
    }
  }
}
