package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.{tokens, toksSql}
import graft.functions.VectorFunctions._
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-TAINT propagation — semi-supervised label spreading over the
  * semantic neighbor graph (Zhu & Ghahramani 2002's label propagation,
  * hop-bounded): a document flagged low-quality taints its nearest
  * semantic neighbors, those taint theirs, for a bounded number of
  * hops. The production use: spam/boilerplate filters catch the
  * blatant copies; their paraphrases and templated siblings sit right
  * next to them in embedding space and inherit the flag — per-document
  * rules alone cannot reach them.
  *
  * Pipeline pieces composed here:
  *  - SEEDS: documents failing BOTH Gopher repetition cuts — the
  *    max-token-fraction rule (one token > 11% of the document) AND the
  *    max-bigram-fraction rule (one bigram > 6%) — evaluated in
  *    INTEGERS (100·max > thr·n), no float;
  *  - GRAPH: undirected k=3 cosine kNN over the embeddings (doc_id ↔
  *    vec_id; documents without a vector can seed but not propagate —
  *    inner-join semantics, identical in the oracle). TWO gated builds:
  *    `q_quality_propagate` is the brute-force comparator (exact kNN,
  *    oracle replays it from raw embeddings; O(n²) BY DESIGN and only
  *    for verification scale), and `q_quality_propagate_ann` is the
  *    scale path — RP-LSH banded candidate generation (adaptive
  *    banding, skew-guarded bucket pairs, candidate volume
  *    O(bands·n·128)) → exact cosine re-score of ONLY the candidates →
  *    per-source bounded top-k. The propagation contract needs only
  *    (src, dst) pairs, so both faces share the BFS verbatim;
  *  - PROPAGATION: 3 BFS rounds, each ONE edge-keyed equi-join of the
  *    frontier against the adjacency list plus an anti-join against
  *    the tainted set, both corpus-bounded; the tainted set is
  *    checkpointed per hop (the PageRank single-reference-per-round
  *    discipline). Hop count is the pipeline owner's bound — each
  *    extra hop is one more linear round.
  *
  * Output: the hop-DISTANCE map — every document reached within
  * [[Hops]] hops with its exact BFS distance to the nearest seed
  * (0 = seed) and source. The distance field is the useful product
  * (cut at radius 1 for a strict filter, radius 2+ for aggressive
  * cleaning); on THIS corpus the 10.6% seed density over a connected
  * k=3 graph reaches everything by hop 3 (53/159/212/76) — the radius
  * chosen by a pipeline owner here would be 1 (42% of the corpus), and
  * the gate's value is the exact frontier per hop. A wrong seed rule,
  * wrong neighbor, wrong hop order, or a taint leaking past its round
  * breaks the hash.
  */
object PropagateQueries {

  private val K = 3
  private val Hops = 3

  /** Seeds = documents failing BOTH Gopher repetition cuts (one token
    * > 11% of the document AND one bigram > 6%) — spammy by two
    * independent signals, all in integers (100·max > thr·n). One
    * tokenize pass; the bigram stream rides the same window lead as
    * the repetition profile.
    */
  private def seedDocs(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("g2", when(lead("tok", 1).over(w).isNotNull,
        concat_ws(" ", col("tok"), lead("tok", 1).over(w))))
    val r1 = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("n"))
      .filter(col("mx") * 100 > col("n") * 11)
    val r2 = tok.filter(col("g2").isNotNull)
      .groupBy("doc_id", "g2").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("mx2"), sum("c").as("n2"))
      .filter(col("mx2") * 100 > col("n2") * 6)
    r1.join(r2, "doc_id").select("doc_id")
  }

  /** Undirected k=[[K]] cosine kNN edges over the embeddings. Per-src
    * top-k rides the BOUNDED kminBy aggregate on (−cos·10⁹, dst) — never
    * a window sort over the all-pairs frame (the first cut's window cost
    * 7.7 s at sf0.1; this shape serves at ~2 s).
    */
  private def knnEdges(e: DataFrame): DataFrame = {
    // r17: fan the PROBE side out before the broadcast nested-loop join —
    // the embeddings table is one parquet split, so without this every
    // pair's dot product AND the map-side kminBy partials ran on a single
    // core (the same single-split serialization shinglePostings had). The
    // round-robin exchange moves n rows to save n² single-threaded work.
    val kn = e.repartition(
        math.min(8, e.sparkSession.sparkContext.defaultParallelism))
      .withColumn("na", norm(col("embedding")))
      .crossJoin(broadcast(e.select(col("vec_id").as("dst"),
        col("embedding").as("ev"), norm(col("embedding")).as("nb"))))
      .filter(col("vec_id") =!= col("dst"))
      .select(col("vec_id").as("src"), col("dst"),
        round(dot(col("embedding"), col("ev")) / (col("na") * col("nb"))
          * 1000000000L, 0).cast("long").as("cos_x1e9"))
      .groupBy("src")
      .agg(graft.functions.KMinAgg.kminBy(-col("cos_x1e9"), col("dst"), K).as("mins"))
      .select(col("src"), explode(col("mins")).as("m"))
      .select(col("src"), col("m.id").as("dst"))
      // the union references the directed kNN twice; checkpoint so the
      // all-pairs pass runs ONCE, not once per union branch. The gate's
      // remaining cost (~6 s of 7.8 at sf0.1) is the kminBy aggregate
      // consuming the 4M-pair brute-force frame — the oracle-replayable
      // face's price; an ANN candidate generator replaces exactly this
      // frame at scale
      .stableCheckpoint()
    kn.unionByName(kn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** ANN-composed kNN edges — the scale face. Candidates come from the
    * RP-LSH band machinery (adaptive banding sized by a parquet-metadata
    * count; [[LshBlocking.boundedBucketPairs]]'s star guard caps hot
    * buckets), so pair volume is O(bands·n·128) and NOTHING is all-pairs
    * or corpus-broadcast: the band self-join is an equi-join on
    * (band_id, band_key) over bare ids, the re-score joins are keyed on
    * vec_id with no broadcast hint (AQE picks shuffle joins at scale),
    * and the per-src top-k is the bounded kminBy aggregate. Recall is
    * the banding curve's: a true neighbor missing from every shared
    * band is absent here — PropagateSpec measures the hop-map agreement
    * against the exact face and the gate's oracle replays the SAME
    * staged candidate set, so the approximation is pinned, not hidden.
    */
  private[pipeline] def annDirectedKnn(e: DataFrame): DataFrame = {
    val (bits, bands) = SimilarityQueries.adaptiveBanding(e.count())
    val banded = e.select(col("vec_id"),
      posexplode(SimilarityQueries.rpBandKeys(col("embedding"),
        bands = bands, rowsPerBand = bits)).as(Seq("band_id", "band_key")))
    val raw = LshBlocking
      .boundedBucketPairs(banded, Seq("band_id", "band_key"), "vec_id")
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
    // oracle bridge over the non-SQL hyperplane hash (the
    // q_dedup_embedding_lsh discipline): Verify mode materializes the
    // candidate ids; bench mode runs the live frame
    val cands = graft.OracleStage.stage("propagate_ann_cands", raw)
    val dir = cands.unionByName(
      cands.select(col("vec_b").as("vec_a"), col("vec_a").as("vec_b")))
      .toDF("src", "dst")
    val vecs = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    dir
      .join(vecs.select(col("vec_id").as("src"), col("embedding").as("ea"),
        col("nrm").as("na")), "src")
      .join(vecs.select(col("vec_id").as("dst"), col("embedding").as("eb"),
        col("nrm").as("nb")), "dst")
      .select(col("src"), col("dst"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb"))
          * 1000000000L, 0).cast("long").as("cos_x1e9"))
      .groupBy("src")
      .agg(graft.functions.KMinAgg.kminBy(-col("cos_x1e9"), col("dst"), K).as("mins"))
      .select(col("src"), explode(col("mins")).as("m"))
      .select(col("src"), col("m.id").as("dst"))
  }

  private[graft] def annKnnEdges(e: DataFrame): DataFrame = {
    // same two-consumer union as the exact face: materialize once
    val kn = annDirectedKnn(e).stableCheckpoint()
    kn.unionByName(kn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Shared BFS + output: seeds at hop 0, [[Hops]] frontier rounds, each
    * ONE edge-keyed equi-join + anti-join, every frontier checkpointed.
    */
  private[graft] def hopMap(docs: DataFrame, edges: DataFrame): DataFrame = {
    var frontiers = Seq(seedDocs(docs)
      .select(col("doc_id"), lit(0L).as("hop")).stableCheckpoint())
    for (r <- 1 to Hops) {
      val tainted = frontiers.reduce(_ unionByName _)
      val next = edges
        .join(frontiers.last.select(col("doc_id").as("src")), "src")
        .select(col("dst").as("doc_id")).distinct()
        .join(tainted, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(r.toLong).as("hop"))
      frontiers = frontiers :+ next.stableCheckpoint()
    }
    frontiers.reduce(_ unionByName _)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "hop")
      .orderBy("doc_id")
  }

  /** Oracle: seed rule + BFS shared; `edgeCtes` supplies kn/ed (exact
    * face recomputes the brute-force kNN; ANN face re-scores the staged
    * candidate set).
    */
  private def propagationSql(edgeCtes: String): String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |cnts AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       |per AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n FROM cnts GROUP BY 1),
       |g2 AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
       |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
       |             FROM t WHERE len(toks) >= 2)),
       |per2 AS (SELECT doc_id, MAX(c) AS mx2, SUM(c) AS n2
       |         FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
       |         GROUP BY 1),
       |seed AS (SELECT doc_id FROM per JOIN per2 USING (doc_id)
       |         WHERE 100 * mx > 11 * n AND 100 * mx2 > 6 * n2),
       |$edgeCtes
       |h0 AS MATERIALIZED (SELECT doc_id FROM seed),
       |h1 AS MATERIALIZED (
       |  SELECT DISTINCT ed.dst AS doc_id FROM ed JOIN h0 ON ed.src = h0.doc_id
       |  WHERE ed.dst NOT IN (SELECT doc_id FROM h0)),
       |h2 AS MATERIALIZED (
       |  SELECT DISTINCT ed.dst AS doc_id FROM ed JOIN h1 ON ed.src = h1.doc_id
       |  WHERE ed.dst NOT IN (SELECT doc_id FROM h0)
       |    AND ed.dst NOT IN (SELECT doc_id FROM h1)),
       |h3 AS MATERIALIZED (
       |  SELECT DISTINCT ed.dst AS doc_id FROM ed JOIN h2 ON ed.src = h2.doc_id
       |  WHERE ed.dst NOT IN (SELECT doc_id FROM h0)
       |    AND ed.dst NOT IN (SELECT doc_id FROM h1)
       |    AND ed.dst NOT IN (SELECT doc_id FROM h2)),
       |allh AS (SELECT doc_id, 0 AS hop FROM h0
       |         UNION ALL SELECT doc_id, 1 FROM h1
       |         UNION ALL SELECT doc_id, 2 FROM h2
       |         UNION ALL SELECT doc_id, 3 FROM h3)
       |SELECT allh.doc_id, d.source, CAST(hop AS BIGINT) AS hop
       |FROM allh JOIN documents d USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Exact-face edge CTEs: brute-force kNN recomputed from raw vectors. */
  private def exactEdgeCtes: String =
    s"""sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |              ROUND(${SimilarityQueries.cosSql("a.embedding", "b.embedding")}, 9) AS c
       |       FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |kn AS MATERIALIZED (
       |  SELECT src, dst FROM sc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, dst) <= $K),
       |ed AS MATERIALIZED (SELECT src, dst FROM kn
       |                    UNION SELECT dst, src FROM kn),""".stripMargin

  /** ANN-face edge CTEs: exact re-score + top-k over the STAGED candidate
    * id pairs — everything downstream of the hyperplane hash replays.
    */
  private def annEdgeCtes: String =
    s"""cand AS (SELECT vec_a, vec_b FROM ${graft.OracleStage.pq("propagate_ann_cands")}),
       |dc AS (SELECT vec_a AS src, vec_b AS dst FROM cand
       |       UNION ALL SELECT vec_b, vec_a FROM cand),
       |sc AS (SELECT dc.src, dc.dst,
       |              ROUND(${SimilarityQueries.cosSql("a.embedding", "b.embedding")}, 9) AS c
       |       FROM dc JOIN embeddings a ON a.vec_id = dc.src
       |               JOIN embeddings b ON b.vec_id = dc.dst),
       |kn AS MATERIALIZED (
       |  SELECT src, dst FROM sc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, dst) <= $K),
       |ed AS MATERIALIZED (SELECT src, dst FROM kn
       |                    UNION SELECT dst, src FROM kn),""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ----- Quality-taint label propagation over the EXACT kNN graph -----
    // The verification-scale comparator: O(n²) pair scoring by design so
    // the oracle can replay the graph from raw embeddings alone.
    QueryDef("q_quality_propagate", propagationSql(exactEdgeCtes)) { (s, d) =>
      hopMap(Tables.documents(s, d),
        knnEdges(Tables.embeddings(s, d)).stableCheckpoint())
    },

    // ----- The same propagation over the ANN-composed graph -------------
    // The scale face: LSH-banded candidates, exact re-score of candidates
    // only, bounded top-k — no all-pairs frame, no corpus-sized broadcast
    // anywhere in the plan (PropagateSpec pins both).
    QueryDef("q_quality_propagate_ann", propagationSql(annEdgeCtes)) { (s, d) =>
      hopMap(Tables.documents(s, d),
        annKnnEdges(Tables.embeddings(s, d)).stableCheckpoint())
    })
}
