package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.{tokens, toksSql}
import graft.functions.VectorFunctions.{dot, norm}
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG-serving composition of the two retrieval
  * arms the engine already gates separately: lexical BM25 over the
  * `documents` postings (q_bm25_topk's integer-exact scoring) and dense
  * cosine over the `embeddings` table (q_ann_cosine_topk's broadcast
  * scoring), fused with Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher 2009): score(d) = Σ_arms 1/(60 + rank_arm(d)).
  *
  * RRF is the production default for hybrid search precisely because it
  * consumes only RANKS — no score normalization across incomparable
  * scales (BM25 sums vs cosine) — which also makes it gate-friendly:
  * ranks are integers, the fused score is the ×10⁶ fixed-point sum of
  * two integral divisions, so the whole fusion is bit-exact cross-engine.
  *
  * Scale shape: each arm is already 100 TB-safe on its own (the lexical
  * arm collapses the posting scan to |q| terms with broadcast df/corpus
  * totals; the dense arm is a broadcast query vector + map-side scoring
  * with TakeOrderedAndProject top-k — swap in the IVF face for a larger
  * corpus). The fusion then joins two k-row lists — driver-trivial at any
  * corpus size. The doc_id↔vec_id correspondence is the testdata's
  * contract (row i's text and embedding describe the same document).
  */
object RetrievalQueries {

  private val qTerms = Seq("spark", "hash", "join")
  private val K = 20 // per-arm shortlist depth feeding the fusion
  private val RrfK = 60 // the standard RRF rank damping constant
  private val BatchQ = 100 // batched face: queries 1..BatchQ (doc/vec ids)
  private val QueryTerms = 3 // lexical terms per batched query
  private val Top = 10 // fused results returned per query

  /** Batched-face query terms: each query doc's top-[[QueryTerms]] tokens
    * (tf DESC, token). Aggregates only the PRE-FILTERED query docs — the
    * per-doc rank window sees ≤ one doc's vocabulary.
    */
  private[graft] def batchQueryTerms(t: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    t.filter(col("doc_id").between(1, BatchQ))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("term"))))
      .filter(col("rn") <= QueryTerms)
      .select(col("doc_id").as("query_id"), col("term"))

  /** Batched-face matched postings: the ONE corpus-sized exchange of the
    * lexical arm — per-(doc, term) frequencies, pruned to the query
    * batch's distinct terms (broadcast). RetrievalPlanSpec audits exactly
    * this shape.
    */
  private[graft] def batchTf(t: org.apache.spark.sql.DataFrame,
      qt: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    t.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(qt.select("term").distinct()), "term")

  /** The batched lexical arm end-to-end over a (doc_id, toks) corpus:
    * (query_id, doc_id, score_x1m) for every matched (query, candidate)
    * pair, own-doc excluded. Shared by the registered gate and
    * SkewProbeR14 (which drives it with a term planted in EVERY document).
    */
  private[graft] def batchLexScores(t: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // qt and tf are each read twice downstream — checkpoint EAGERLY so
    // the one corpus-sized (doc, term) aggregate runs once (plans don't
    // share subtrees; the r12 PageRank lesson)
    val qt = batchQueryTerms(t).stableCheckpoint()
    val tf = batchTf(t, qt).stableCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dlen = t.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val gl = dlen.agg(sum("dl").as("l"), count(lit(1)).as("n"))
    tf
      .join(broadcast(qt), "term").filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(dfreq), "term")
      .join(dlen, "doc_id")
      .crossJoin(broadcast(gl))
      .select(col("query_id"), col("doc_id"),
        expr("((2*(n - df) + 1) * 1000) DIV (2*df + 1)").as("idf1k"),
        expr("(22 * tf * l * 1000) DIV (10*l*tf + 3*l + 9*dl*n)").as("tfn1k"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("idf1k * tfn1k")).as("score_x1m"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- Hybrid BM25 + dense-cosine retrieval, RRF-fused top-10 -----
    // Query fixture: the text query ['spark','hash','join'] with the
    // vec_id=0 embedding as its dense form; doc 0 is excluded from both
    // arms (it IS the query). A document missing from one arm's top-K
    // contributes only the other arm's term (rank reported as 0 = absent).
    QueryDef(
      "q_hybrid_rrf",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id <> 0),
         |q AS (SELECT unnest(['spark', 'hash', 'join']) AS term),
         |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf AS (SELECT tok.doc_id, tok.term, COUNT(*) AS tf
         |       FROM tok JOIN q USING (term) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
         |gl AS (SELECT CAST(SUM(dl) AS BIGINT) AS l, COUNT(*) AS n FROM dl),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |contrib AS (
         |  SELECT tf.doc_id,
         |         ((2*(gl.n - df.df) + 1) * 1000) // (2*df.df + 1) AS idf1k,
         |         (22 * tf.tf * gl.l * 1000)
         |           // (10*gl.l*tf.tf + 3*gl.l + 9*dl.dl*gl.n) AS tfn1k
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN gl),
         |lex AS (SELECT doc_id, CAST(SUM(idf1k * tfn1k) AS BIGINT) AS score_x1m
         |        FROM contrib GROUP BY 1),
         |lexr AS (SELECT doc_id,
         |                ROW_NUMBER() OVER (ORDER BY score_x1m DESC, doc_id) AS r
         |         FROM lex QUALIFY r <= $K),
         |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dense AS (SELECT e.vec_id AS doc_id,
         |                 ROUND(${SimilarityQueries.cosSql("e.embedding", "qv")}, 9) AS cosine
         |          FROM embeddings e, qv WHERE e.vec_id <> 0),
         |denser AS (SELECT doc_id,
         |                  ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r
         |           FROM dense QUALIFY r <= $K),
         |fused AS (
         |  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         |         COALESCE(l.r, 0) AS r_lex,
         |         COALESCE(d.r, 0) AS r_dense,
         |         (CASE WHEN l.r IS NULL THEN 0 ELSE 1000000 // ($RrfK + l.r) END
         |          + CASE WHEN d.r IS NULL THEN 0 ELSE 1000000 // ($RrfK + d.r) END)
         |           AS rrf_x1m
         |  FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id)
         |SELECT doc_id, r_lex, r_dense, rrf_x1m
         |FROM fused
         |ORDER BY rrf_x1m DESC, doc_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      // lexical arm: q_bm25_topk's integer-exact scoring, shortlist K
      val t = Tables.documents(s, d).filter(col("doc_id") =!= 0)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val dlen = t.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      val gl = dlen.agg(sum("dl").as("l"), count(lit(1)).as("n"))
      val tf = t.select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val lex = tf.join(broadcast(dfreq), "term")
        .join(dlen, "doc_id")
        .crossJoin(broadcast(gl))
        .select(col("doc_id"),
          expr("((2*(n - df) + 1) * 1000) DIV (2*df + 1)").as("idf1k"),
          expr("(22 * tf * l * 1000) DIV (10*l*tf + 3*l + 9*dl*n)").as("tfn1k"))
        .groupBy("doc_id")
        .agg(sum(expr("idf1k * tfn1k")).as("score_x1m"))
      // top-K FIRST via TakeOrderedAndProject, THEN rank: the unpartitioned
      // row_number window only ever sees K rows, never the corpus
      val lexr = lex
        .orderBy(col("score_x1m").desc, col("doc_id")).limit(K)
        .withColumn("r_lex", row_number().over(
          Window.orderBy(col("score_x1m").desc, col("doc_id"))))
        .select("doc_id", "r_lex")

      // dense arm: q_ann_cosine_topk's broadcast scoring, shortlist K
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), norm(col("embedding")).as("nq"))
      val denser = e.filter(col("vec_id") =!= 0)
        .withColumn("na", norm(col("embedding")))
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(dot(col("embedding"), col("qv")) / (col("na") * col("nq")), 9).as("cosine"))
        .orderBy(col("cosine").desc, col("doc_id")).limit(K)
        .withColumn("r_dense", row_number().over(
          Window.orderBy(col("cosine").desc, col("doc_id"))))
        .select("doc_id", "r_dense")

      // RRF fusion over the two K-row shortlists (driver-trivial at any
      // corpus size); ×10⁶ fixed-point keeps the sum integer-exact
      lexr.join(denser, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0)).cast("long").as("r_lex"),
          coalesce(col("r_dense"), lit(0)).cast("long").as("r_dense"),
          (when(col("r_lex").isNull, 0L)
            .otherwise(expr(s"CAST(1000000 DIV ($RrfK + r_lex) AS BIGINT)")) +
           when(col("r_dense").isNull, 0L)
            .otherwise(expr(s"CAST(1000000 DIV ($RrfK + r_dense) AS BIGINT)")))
            .as("rrf_x1m"))
        .orderBy(col("rrf_x1m").desc, col("doc_id"))
        .limit(10)
    },

    // ----- BATCHED hybrid retrieval: ~100 queries in one plan -----
    // The SERVING shape (r13 verdict item 3): retrieval is never one
    // query at a time in production — a batch of queries joins the
    // postings and embedding sides AT ONCE, and the per-query work rides
    // the same exchanges. Query fixture: query q (1..100) = doc q's
    // top-3 tokens (tf DESC, token — deterministic) + embedding q; each
    // query's own doc is excluded from its candidates.
    //
    // Scale shape, per arm:
    //  - lexical: ONE corpus-sized exchange (the (doc, term) tf
    //    aggregate); query terms, df, and corpus totals are broadcast;
    //    scoring and the (query, doc) rollup run over MATCHED postings
    //    only — adding queries widens the broadcast, not the corpus scan,
    //    and there is no per-query job (RetrievalPlanSpec audits this);
    //  - dense: all 100 query vectors broadcast once, corpus rows score
    //    map-side against every query;
    //  - per-query top-K via the BOUNDED kminBy aggregate on the
    //    (−score, doc_id) key — ≤ K pairs per partial buffer, so no
    //    corpus-sized rank window anywhere (the r13 single-query face
    //    could TakeOrderedAndProject; a batch cannot, kminBy is its
    //    per-group equivalent). Ranks come from posexploding the ≤K-row
    //    sorted shortlist arrays.
    // Fusion then full-outer-joins two ≤K-row lists per query and
    // windows over ≤2K rows per query. Dense ranks use the ×10⁹
    // fixed-point cosine as the sort key so both engines rank the same
    // integers (the underlying doubles are bit-identical, as every
    // cosine gate already proves).
    QueryDef(
      "q_hybrid_rrf_batch",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf_all AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |qt AS (SELECT doc_id AS query_id, term FROM (
         |         SELECT doc_id, term, tf,
         |                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn
         |         FROM tf_all WHERE doc_id BETWEEN 1 AND $BatchQ)
         |       WHERE rn <= $QueryTerms),
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
         |lexr AS (SELECT query_id, doc_id,
         |                ROW_NUMBER() OVER (PARTITION BY query_id
         |                                   ORDER BY score_x1m DESC, doc_id) AS r
         |         FROM lex QUALIFY r <= $K),
         |qv AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |       WHERE vec_id BETWEEN 1 AND $BatchQ),
         |dense AS (SELECT qv.query_id, e.vec_id AS doc_id,
         |                 CAST(ROUND((${SimilarityQueries.cosSql("e.embedding", "qv")})
         |                            * 1000000000) AS BIGINT) AS cos_x1e9
         |          FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id),
         |denser AS (SELECT query_id, doc_id,
         |                  ROW_NUMBER() OVER (PARTITION BY query_id
         |                                     ORDER BY cos_x1e9 DESC, doc_id) AS r
         |           FROM dense QUALIFY r <= $K),
         |fused AS (
         |  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         |         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         |         COALESCE(l.r, 0) AS r_lex,
         |         COALESCE(d.r, 0) AS r_dense,
         |         (CASE WHEN l.r IS NULL THEN 0 ELSE 1000000 // ($RrfK + l.r) END
         |          + CASE WHEN d.r IS NULL THEN 0 ELSE 1000000 // ($RrfK + d.r) END)
         |           AS rrf_x1m
         |  FROM lexr l FULL OUTER JOIN denser d
         |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
         |top AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |                                     ORDER BY rrf_x1m DESC, doc_id) AS rn
         |        FROM fused)
         |SELECT query_id, doc_id, r_lex, r_dense, rrf_x1m
         |FROM top WHERE rn <= $Top
         |ORDER BY query_id, rrf_x1m DESC, doc_id""".stripMargin) { (s, d) =>
      import graft.functions.KMinAgg

      val t = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val lex = batchLexScores(t)
      // bounded per-query top-K: kminBy on (−score, doc) — never a
      // corpus-sized sort or window
      val lexr = lex.groupBy("query_id")
        .agg(KMinAgg.kminBy(-col("score_x1m"), col("doc_id"), K).as("mins"))
        .select(col("query_id"), posexplode(col("mins")))
        .select(col("query_id"), col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("r_lex"))

      val e = Tables.embeddings(s, d)
      val qv = broadcast(e.filter(col("vec_id").between(1, BatchQ))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          norm(col("embedding")).as("nq")))
      val denser = e.withColumn("na", norm(col("embedding")))
        .crossJoin(qv).filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          round(dot(col("embedding"), col("qv")) / (col("na") * col("nq"))
            * 1000000000L, 0).cast("long").as("cos_x1e9"))
        .groupBy("query_id")
        .agg(KMinAgg.kminBy(-col("cos_x1e9"), col("doc_id"), K).as("mins"))
        .select(col("query_id"), posexplode(col("mins")))
        .select(col("query_id"), col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("r_dense"))

      val fused = lexr.join(denser, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("r_lex"), lit(0L)).as("r_lex"),
          coalesce(col("r_dense"), lit(0L)).as("r_dense"),
          (when(col("r_lex").isNull, 0L)
            .otherwise(expr(s"CAST(1000000 DIV ($RrfK + r_lex) AS BIGINT)")) +
           when(col("r_dense").isNull, 0L)
            .otherwise(expr(s"CAST(1000000 DIV ($RrfK + r_dense) AS BIGINT)")))
            .as("rrf_x1m"))
      fused.withColumn("rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("rrf_x1m").desc, col("doc_id"))))
        .filter(col("rn") <= Top)
        .select("query_id", "doc_id", "r_lex", "r_dense", "rrf_x1m")
        .orderBy(col("query_id"), col("rrf_x1m").desc, col("doc_id"))
    })
}
