package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of q_eval_retrieval: the gate's count-filled IDCG equals a true
  * ideal re-sort, nDCG is the textbook ratio recomputed independently in
  * plain Scala from the gate's own ranked lists and judgments, MRR's rank
  * is the first grade-≥2 position, and the metric bounds hold (a system
  * ranking can never beat the ideal).
  */
class RetrievalEvalSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def gate = graft.SparkEntry.queries("q_eval_retrieval")(spark, d)

  private val disc: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L,
      315464L, 301029L, 289064L)

  /** Independent replay: tokenize in Scala, derive the query batch (top-3
    * tokens by tf DESC, token), grade every other doc by term overlap, rank
    * by the SAME BM25 integers the lexical arm emits (recomputed here from
    * first principles), and fold the metrics with a TRUE ideal re-sort
    * (sort judged grades descending, discount-weigh the top 10) instead of
    * the gate's prefix-table count fill.
    */
  private lazy val replay: Map[Long, (Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val n = docs.size.toLong
    val l = docs.valuesIterator.map(_.size.toLong).sum
    val tfAll: Map[Long, Map[String, Long]] =
      docs.map { case (id, ts) =>
        id -> ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      }
    val queries: Map[Long, Seq[String]] = (1L to 100L).flatMap { q =>
      tfAll.get(q).filter(_.nonEmpty).map { tf =>
        q -> tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
      }
    }.toMap
    queries.map { case (q, terms) =>
      // judgments: grade = overlap count, own doc excluded
      val rel: Map[Long, Int] = docs.collect {
        case (id, ts) if id != q =>
          id -> terms.count(ts.contains)
      }.filter(_._2 > 0).toMap
      // BM25 integers exactly as the arm computes them
      val qTermSet = terms.toSet
      val df: Map[String, Long] = qTermSet.iterator.map { t =>
        t -> tfAll.valuesIterator.count(_.contains(t)).toLong
      }.toMap
      val scores: Map[Long, Long] = docs.keysIterator.filter(_ != q).flatMap { id =>
        val dl = docs(id).size.toLong
        val contribs = qTermSet.toSeq.flatMap { t =>
          tfAll(id).get(t).map { tf =>
            val idf1k = ((2 * (n - df(t)) + 1) * 1000) / (2 * df(t) + 1)
            val tfn1k = (22 * tf * l * 1000) / (10 * l * tf + 3 * l + 9 * dl * n)
            idf1k * tfn1k
          }
        }
        // a matched doc stays in the arm's output even if integer idf/tf
        // flooring zeroes its score — the gate's lex frame keeps it too
        if (contribs.nonEmpty) Some(id -> contribs.sum) else None
      }.toMap
      val top = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      val dcg = top.zipWithIndex.map { case ((id, _), i) =>
        val g = rel.getOrElse(id, 0) match {
          case 3 => 7L; case 2 => 3L; case 1 => 1L; case _ => 0L
        }
        g * disc(i)
      }.sum
      // TRUE ideal: sort judged grades descending, weigh the top 10
      val idcg = rel.values.toSeq.sorted(Ordering.Int.reverse).take(10)
        .zipWithIndex.map { case (g, i) =>
          (g match { case 3 => 7L; case 2 => 3L; case 1 => 1L; case _ => 0L }) * disc(i)
        }.sum
      val rank2 = top.zipWithIndex.collectFirst {
        case ((id, _), i) if rel.getOrElse(id, 0) >= 2 => (i + 1).toLong
      }.getOrElse(0L)
      val hit3 = top.count { case (id, _) => rel.getOrElse(id, 0) == 3 }.toLong
      q -> (dcg, idcg, rank2, hit3)
    }
  }

  test("DCG, IDCG, first-relevant rank and grade-3 hits equal the independent replay") {
    val got = gate.select("query_id", "dcg_x1m", "idcg_x1m", "rank_rel2", "hit3")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (q, exp) =>
      assert(got(q) == exp, s"query $q: got ${got(q)}, replay $exp")
    }
  }

  test("nDCG is bounded by 1000 and the ratio matches the emitted fixed point") {
    gate.select("dcg_x1m", "idcg_x1m", "ndcg_permille").collect().foreach { r =>
      val (dcg, idcg, nd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nd >= 0 && nd <= 1000)
      if (idcg > 0) assert(nd == dcg * 1000 / idcg) else assert(nd == 0)
    }
  }

  test("hybrid-face metrics equal a Scala fold over the hash-verified fused ranking") {
    // system ranking = the registered (and independently hash-gated)
    // q_hybrid_rrf_batch output; judgments replayed from raw text — so
    // this pins the METRIC fold over a second, different ranking
    val fused = graft.SparkEntry.queries("q_hybrid_rrf_batch")(spark, d)
      .select("query_id", "doc_id", "rrf_x1m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy { case (_, id, s) => (-s, id) }.map(_._2).toSeq
      }
    val judged: Map[Long, Map[Long, Int]] = {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq).toMap
      val terms: Map[Long, Seq[String]] = (1L to 100L).flatMap { q =>
        docs.get(q).filter(_.nonEmpty).map { ts =>
          val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
          q -> tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
        }
      }.toMap
      terms.map { case (q, qs) =>
        q -> docs.collect { case (id, ts) if id != q =>
          id -> qs.count(ts.contains)
        }.filter(_._2 > 0).toMap
      }
    }
    def gain(g: Int): Long = g match { case 3 => 7L; case 2 => 3L; case 1 => 1L; case _ => 0L }
    val got = graft.SparkEntry.queries("q_eval_retrieval_hybrid")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(7), r.getLong(9))).toMap // dcg, rank_rel2, hit3
    assert(got.keySet == judged.keySet)
    got.foreach { case (q, (dcg, rank2, hit3)) =>
      val ranking = fused.getOrElse(q, Seq.empty)
      val rel = judged(q)
      val expDcg = ranking.zipWithIndex
        .map { case (id, i) => gain(rel.getOrElse(id, 0)) * disc(i) }.sum
      val expRank2 = ranking.zipWithIndex.collectFirst {
        case (id, i) if rel.getOrElse(id, 0) >= 2 => (i + 1).toLong
      }.getOrElse(0L)
      val expHit3 = ranking.count(id => rel.getOrElse(id, 0) == 3).toLong
      assert((dcg, rank2, hit3) == ((expDcg, expRank2, expHit3)),
        s"query $q: got ($dcg,$rank2,$hit3) exp ($expDcg,$expRank2,$expHit3)")
    }
  }

  test("the eval detects a ranking change: hybrid and lexical metrics differ somewhere") {
    // an eval that scores every ranking identically is decoration — the
    // fused face must move at least one query's nDCG or MRR
    val lex = gate.select("query_id", "ndcg_permille", "rr_x1m").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hyb = graft.SparkEntry.queries("q_eval_retrieval_hybrid")(spark, d)
      .select("query_id", "ndcg_permille", "rr_x1m").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(lex.keySet == hyb.keySet)
    assert(lex.exists { case (q, m) => hyb(q) != m },
      "hybrid fusion changed no query's metrics — the eval cannot discriminate rankings")
  }

  test("MRR reciprocal and recall are the integral transforms of their ranks/counts") {
    gate.select("rank_rel2", "rr_x1m", "n3", "hit3", "recall3_permille")
      .collect().foreach { r =>
        val (rank2, rr, n3, hit3, rec) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(rr == (if (rank2 == 0) 0L else 1000000L / rank2))
        assert(rec == (if (n3 == 0) 0L else hit3 * 1000 / n3))
        assert(hit3 <= n3)
      }
  }
}
