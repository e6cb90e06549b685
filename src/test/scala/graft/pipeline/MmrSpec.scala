package graft.pipeline

import graft.SparkSpec

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Laws of the MMR diversified-retrieval gate (q_retrieval_mmr): exact
  * agreement with an independent driver-side greedy replay, and the
  * diversification property vs. plain relevance top-k.
  */
class MmrSpec extends SparkSpec {

  private val Lambda7 = 7L // λ=0.7 in the ×10 integer split 7·rel − 3·sim
  private val N = 24
  private val K = 8

  /** ×10⁹ fixed-point cosine exactly as the query computes it: sequential
    * float→double dot and norms, one IEEE multiply by 1e9, HALF_UP round
    * (Spark's round(_, 0) on DOUBLE).
    */
  private def relFx(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val v = dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000000L
    new JBigDecimal(v).setScale(0, RoundingMode.HALF_UP).longValueExact()
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Independent greedy replay: shortlist by (rel DESC, vec_id), then k−1
    * rounds of argmax 7·rel − 3·max-sim-to-selected with (score DESC,
    * vec_id) ties — the law the Spark fold and the unrolled DuckDB oracle
    * must both implement.
    */
  private def replay(q: Long): Seq[(Long, Long, Long)] = {
    val rel = vecs.collect { case (id, v) if id != q => id -> relFx(vecs(q), v) }
    val short = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(N)
    val relMap = short.toMap
    val sim = (for {
      (a, _) <- short; (b, _) <- short if a != b
    } yield (a, b) -> relFx(vecs(a), vecs(b))).toMap
    val first = short.minBy { case (id, r) => (-r, id) }
    val out = scala.collection.mutable.ArrayBuffer((first._1, Lambda7 * first._2, 1L))
    val selected = scala.collection.mutable.Set(first._1)
    for (step <- 2 to K) {
      val next = short.filterNot { case (id, _) => selected(id) }
        .map { case (id, r) =>
          val ms = selected.map(s => sim((id, s))).max
          (id, Lambda7 * r - 3L * ms)
        }
        .minBy { case (id, sc) => (-sc, id) }
      selected += next._1
      out += ((next._1, next._2, step.toLong))
    }
    out.toSeq
  }

  private lazy val gate: Map[Long, Seq[(Long, Long, Long)]] =
    graft.SparkEntry.queries("q_retrieval_mmr")(spark, sf("sf0.01"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(t => (t._3, t._4, t._2)).toSeq
      }

  test("MMR equals an independent driver-side greedy replay, bit for bit") {
    assert(gate.nonEmpty)
    gate.foreach { case (q, got) =>
      val want = replay(q)
      assert(got == want, s"query $q: gate $got vs replay $want")
    }
  }

  test("MMR diversifies: max pairwise sim never exceeds relevance top-k's") {
    var strict = 0
    gate.foreach { case (q, got) =>
      val topK = vecs.collect { case (id, v) if id != q => id -> relFx(vecs(q), v) }
        .toSeq.sortBy { case (id, r) => (-r, id) }.take(K).map(_._1)
      val picked = got.map(_._1)
      def maxPair(ids: Seq[Long]): Long =
        (for (a <- ids; b <- ids if a < b) yield relFx(vecs(a), vecs(b))).max
      val (mt, mm) = (maxPair(topK), maxPair(picked))
      assert(mm <= mt, s"query $q: MMR maxsim $mm > top-k maxsim $mt")
      if (mm < mt) strict += 1
    }
    info(s"strictly more diverse on $strict/${gate.size} queries")
    assert(strict >= gate.size / 2, s"only $strict strict improvements")
  }
}
