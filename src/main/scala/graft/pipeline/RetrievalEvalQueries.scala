package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.KMinAgg
import graft.functions.TextFunctions.{tokens, toksSql}
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the measurement half of the retrieval
  * family: once a ranking face ships (q_bm25_topk / q_hybrid_rrf_batch),
  * the pipeline needs nDCG@k, MRR and recall@k against a judgment set to
  * know whether a ranking change helped (Järvelin & Kekäläinen 2002 for
  * DCG; the reference quickstart's analytics loop has the same
  * "measure before trusting" discipline for its CDC tables).
  *
  * Fixture: the q_hybrid_rrf_batch query batch (query q = doc q's top-3
  * tokens, q = 1..100, own doc excluded). Judgments are INDEPENDENT of the
  * system score: graded relevance rel(q,d) = number of q's three query
  * terms present in d (1..3, term-overlap grading), so the metric can
  * disagree with BM25's ranking — which is the point of an eval.
  *
  * Integer-exact cross-engine: gains are 2^rel−1 ∈ {1,3,7}; rank discounts
  * use the ×10⁶ fixed-point table D(i) = ⌊10⁶/log2(i+1)⌋ embedded as
  * LITERALS in both engines (computed once, offline — no runtime
  * transcendentals to diverge); IDCG comes from grade COUNTS via the
  * prefix-sum table P(k) = Σ_{i≤k} D(i) (fill ranks greedily best-grade-
  * first), so no per-query ideal re-sort exists anywhere. MRR's reciprocal
  * is the integral 10⁶ DIV rank.
  *
  * Scale shape: the corpus-sized work is exactly the two exchanges the
  * batched lexical arm already pays — the (doc, term) tf aggregate
  * (query-term-pruned via broadcast) and the distinct-presence judgment
  * frame (same pruning). Per-query ranking is the bounded kminBy(10) — no
  * corpus window — and every metric is a fold over ≤10 ranked rows plus a
  * 3-cell grade count. Adding queries widens broadcasts, not corpus scans.
  */
object RetrievalEvalQueries {

  private val K = 10 // evaluation depth: metrics @ 10

  /** ×10⁶ rank discounts D(i) = ⌊10⁶ / log2(i+1)⌋, i = 1..K (literals —
    * see scaladoc; both engines consume exactly these integers).
    */
  private val Disc: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L,
      315464L, 301029L, 289064L)

  /** Prefix sums P(k) = Σ_{i=1..k} D(i), k = 0..K — IDCG's greedy fill. */
  private val Pfx: Seq[Long] = Disc.scanLeft(0L)(_ + _)

  private def discCase(rankCol: String): String =
    s"CASE $rankCol " +
      Disc.zipWithIndex.map { case (v, i) => s"WHEN ${i + 1} THEN ${v}" }
        .mkString(" ") + " ELSE 0 END"

  private def pfxCase(kExpr: String): String =
    s"CASE LEAST($kExpr, $K) " +
      Pfx.zipWithIndex.map { case (v, k) => s"WHEN $k THEN ${v}" }
        .mkString(" ") + " END"

  private val gainCase =
    "CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END"

  val defs: Seq[QueryDef] = Seq(

    // ----- nDCG@10 / MRR / recall@10 of the batched BM25 arm -----
    // One row per query: the judged-set grade counts, the system DCG vs
    // the count-derived IDCG, the first rank at grade ≥2 with its
    // reciprocal, and grade-3 recall. A wrong discount cell, a wrong
    // greedy fill, an off-by-one rank, or a tie broken differently in the
    // kminBy shortlist all break the hash.
    QueryDef(
      "q_eval_retrieval",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf_all AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |qt AS (SELECT doc_id AS query_id, term FROM (
         |         SELECT doc_id, term, tf,
         |                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn
         |         FROM tf_all WHERE doc_id BETWEEN 1 AND 100)
         |       WHERE rn <= 3),
         |tf AS (SELECT doc_id, term, tf FROM tf_all
         |       WHERE term IN (SELECT DISTINCT term FROM qt)),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
         |gl AS (SELECT CAST(SUM(dl) AS BIGINT) AS l, COUNT(*) AS n FROM dl),
         |contrib AS (
         |  SELECT qt.query_id, tf.doc_id,
         |         ((2*(gl.n - df.df) + 1) * 1000) // (2*df.df + 1) AS idf1k,
         |         (22 * tf.tf * gl.l * 1000)
         |           // (10*gl.l*tf.tf + 3*gl.l + 9*dl.dl*gl.n) AS tfn1k
         |  FROM qt JOIN tf USING (term) JOIN df USING (term)
         |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN gl
         |  WHERE tf.doc_id <> qt.query_id),
         |lex AS (SELECT query_id, doc_id, CAST(SUM(idf1k * tfn1k) AS BIGINT) AS score_x1m
         |        FROM contrib GROUP BY 1, 2),
         |top AS (SELECT query_id, doc_id,
         |               ROW_NUMBER() OVER (PARTITION BY query_id
         |                                  ORDER BY score_x1m DESC, doc_id) AS r
         |        FROM lex QUALIFY r <= $K),
         |pres AS (SELECT qt.query_id, dt.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
         |         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         |         JOIN qt USING (term)
         |         WHERE dt.doc_id <> qt.query_id
         |         GROUP BY 1, 2),
         |gc AS (SELECT query_id,
         |              CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |              CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |              CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |       FROM pres GROUP BY 1),
         |rk AS (SELECT top.query_id, top.doc_id, top.r,
         |              COALESCE(pres.rel, 0) AS rel
         |       FROM top LEFT JOIN pres
         |         ON top.query_id = pres.query_id AND top.doc_id = pres.doc_id),
         |m AS (SELECT query_id,
         |             CAST(SUM(($gainCase) * (${discCase("r")})) AS BIGINT) AS dcg_x1m,
         |             CAST(COALESCE(MIN(CASE WHEN rel >= 2 THEN r END), 0) AS BIGINT) AS rank_rel2,
         |             CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hit3
         |      FROM rk GROUP BY 1),
         |j AS (SELECT gc.query_id, gc.n3, gc.n2, gc.n1,
         |             COALESCE(m.dcg_x1m, 0) AS dcg_x1m,
         |             COALESCE(m.rank_rel2, 0) AS rank_rel2,
         |             COALESCE(m.hit3, 0) AS hit3,
         |             (7 * (${pfxCase("gc.n3")})
         |              + 3 * ((${pfxCase("gc.n3 + gc.n2")}) - (${pfxCase("gc.n3")}))
         |              + 1 * ((${pfxCase("gc.n3 + gc.n2 + gc.n1")})
         |                     - (${pfxCase("gc.n3 + gc.n2")}))) AS idcg_x1m
         |      FROM gc LEFT JOIN m ON gc.query_id = m.query_id)
         |SELECT query_id, n3, n2, n1, dcg_x1m, CAST(idcg_x1m AS BIGINT) AS idcg_x1m,
         |       CAST(CASE WHEN idcg_x1m = 0 THEN 0
         |                 ELSE dcg_x1m * 1000 // idcg_x1m END AS BIGINT) AS ndcg_permille,
         |       rank_rel2,
         |       CAST(CASE WHEN rank_rel2 = 0 THEN 0
         |                 ELSE 1000000 // rank_rel2 END AS BIGINT) AS rr_x1m,
         |       hit3,
         |       CAST(CASE WHEN n3 = 0 THEN 0
         |                 ELSE hit3 * 1000 // n3 END AS BIGINT) AS recall3_permille
         |FROM j ORDER BY query_id""".stripMargin) { (s, d) =>
      metricsOf(Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks")))
    },

    // ----- The same metrics over the FUSED hybrid ranking -----
    // Evaluates the actual serving face (q_hybrid_rrf_batch's RRF fusion
    // of BM25 + dense cosine) against the same term-overlap judgments —
    // the A/B readout a ranking change ships or dies by. The dense arm
    // can surface docs sharing NO query term (rel = 0, gain 0), so the
    // hybrid's nDCG measures what fusion actually costs/buys under a
    // lexical judgment set; the rank under the discount is the FUSED rank.
    QueryDef(
      "q_eval_retrieval_hybrid",
      s"""WITH ${RetrievalQueries.hybridBatchCtes},
         |sys AS (SELECT query_id, doc_id, rn AS r FROM top WHERE rn <= $K),
         |pres AS (SELECT qt.query_id, dt.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
         |         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         |         JOIN qt USING (term)
         |         WHERE dt.doc_id <> qt.query_id
         |         GROUP BY 1, 2),
         |gc AS (SELECT query_id,
         |              CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |              CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |              CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |       FROM pres GROUP BY 1),
         |rk AS (SELECT sys.query_id, sys.doc_id, sys.r,
         |              COALESCE(pres.rel, 0) AS rel
         |       FROM sys LEFT JOIN pres
         |         ON sys.query_id = pres.query_id AND sys.doc_id = pres.doc_id),
         |m AS (SELECT query_id,
         |             CAST(SUM(($gainCase) * (${discCase("r")})) AS BIGINT) AS dcg_x1m,
         |             CAST(COALESCE(MIN(CASE WHEN rel >= 2 THEN r END), 0) AS BIGINT) AS rank_rel2,
         |             CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hit3
         |      FROM rk GROUP BY 1),
         |j AS (SELECT gc.query_id, gc.n3, gc.n2, gc.n1,
         |             COALESCE(m.dcg_x1m, 0) AS dcg_x1m,
         |             COALESCE(m.rank_rel2, 0) AS rank_rel2,
         |             COALESCE(m.hit3, 0) AS hit3,
         |             (7 * (${pfxCase("gc.n3")})
         |              + 3 * ((${pfxCase("gc.n3 + gc.n2")}) - (${pfxCase("gc.n3")}))
         |              + 1 * ((${pfxCase("gc.n3 + gc.n2 + gc.n1")})
         |                     - (${pfxCase("gc.n3 + gc.n2")}))) AS idcg_x1m
         |      FROM gc LEFT JOIN m ON gc.query_id = m.query_id)
         |SELECT query_id, n3, n2, n1, dcg_x1m, CAST(idcg_x1m AS BIGINT) AS idcg_x1m,
         |       CAST(CASE WHEN idcg_x1m = 0 THEN 0
         |                 ELSE dcg_x1m * 1000 // idcg_x1m END AS BIGINT) AS ndcg_permille,
         |       rank_rel2,
         |       CAST(CASE WHEN rank_rel2 = 0 THEN 0
         |                 ELSE 1000000 // rank_rel2 END AS BIGINT) AS rr_x1m,
         |       hit3,
         |       CAST(CASE WHEN n3 = 0 THEN 0
         |                 ELSE hit3 * 1000 // n3 END AS BIGINT) AS recall3_permille
         |FROM j ORDER BY query_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val top = RetrievalQueries.hybridBatchFused(t, Tables.embeddings(s, d))
        .filter(col("rn") <= K)
        .select(col("query_id"), col("doc_id"), col("rn").cast("long").as("r"))
      metricsOfRanking(t, top)
    })

  /** The full eval pipeline over an explicit (doc_id, toks) corpus with
    * the BM25 arm as the system under test — shared by the gate and the
    * ×10 scale probe (corpus grows, the 100-query batch stays pinned to
    * base doc ids 1..100).
    */
  private[graft] def metricsOf(t: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      // system ranking: the registered batched BM25 arm, bounded top-10
      // per query via kminBy — never a corpus-sized window
      val top = RetrievalQueries.batchLexScores(t)
        .groupBy("query_id")
        .agg(KMinAgg.kminBy(-col("score_x1m"), col("doc_id"), K).as("mins"))
        .select(col("query_id"), posexplode(col("mins")))
        .select(col("query_id"), col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("r"))
      metricsOfRanking(t, top)
  }

  /** Judgments + metrics over ANY per-query (query_id, doc_id, r ≤ K)
    * system ranking — the ranking under test is a parameter, so the same
    * metric fold evaluates the lexical arm and the fused hybrid face.
    */
  private[graft] def metricsOfRanking(t: org.apache.spark.sql.DataFrame,
      top: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // judgments: distinct term presence joined to the broadcast query
      // terms — the same pruned-postings exchange shape as the lexical arm
      val qt = RetrievalQueries.batchQueryTerms(t).stableCheckpoint()
      val pres = t
        .select(col("doc_id"), explode(array_distinct(col("toks"))).as("term"))
        .join(broadcast(qt), "term")
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).cast("long").as("rel"))
        .stableCheckpoint() // consumed twice: grade counts + rank join
      val gc = pres.groupBy("query_id").agg(
        sum(when(col("rel") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("rel") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("rel") === 1, 1L).otherwise(0L)).as("n1"))

      val rk = top.join(pres, Seq("query_id", "doc_id"), "left")
        .select(col("query_id"), col("r"),
          coalesce(col("rel"), lit(0L)).as("rel"))
      val m = rk.groupBy("query_id").agg(
        sum(expr(s"($gainCase) * (${discCase("r")})")).as("dcg_x1m"),
        coalesce(min(when(col("rel") >= 2, col("r"))), lit(0L)).as("rank_rel2"),
        sum(when(col("rel") === 3, 1L).otherwise(0L)).as("hit3"))

      gc.join(m, Seq("query_id"), "left")
        .select(col("query_id"), col("n3"), col("n2"), col("n1"),
          coalesce(col("dcg_x1m"), lit(0L)).as("dcg_x1m"),
          coalesce(col("rank_rel2"), lit(0L)).as("rank_rel2"),
          coalesce(col("hit3"), lit(0L)).as("hit3"))
        .withColumn("idcg_x1m", expr(
          s"""7 * (${pfxCase("n3")})
             | + 3 * ((${pfxCase("n3 + n2")}) - (${pfxCase("n3")}))
             | + 1 * ((${pfxCase("n3 + n2 + n1")}) - (${pfxCase("n3 + n2")}))"""
            .stripMargin.replace("\n", " ")).cast("long"))
        .select(col("query_id"), col("n3"), col("n2"), col("n1"),
          col("dcg_x1m"), col("idcg_x1m"),
          expr("CASE WHEN idcg_x1m = 0 THEN 0L ELSE dcg_x1m * 1000 DIV idcg_x1m END")
            .as("ndcg_permille"),
          col("rank_rel2"),
          expr("CASE WHEN rank_rel2 = 0 THEN 0L ELSE 1000000 DIV rank_rel2 END")
            .as("rr_x1m"),
          col("hit3"),
          expr("CASE WHEN n3 = 0 THEN 0L ELSE hit3 * 1000 DIV n3 END")
            .as("recall3_permille"))
        .orderBy("query_id")
  }
}
