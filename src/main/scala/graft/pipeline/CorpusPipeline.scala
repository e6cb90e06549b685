package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus construction: the composition that turns a raw
  * document table into a cleaned corpus — the actual job a 100 TB text
  * pipeline runs nightly.
  *
  * Stages (all one lazy DAG, no driver-side loops):
  *  1. per-doc stats (tokens, quality heuristics) — map-only;
  *  2. quality gate — pushed-down filter;
  *  3. exact dedup on content digest — keep lowest doc_id per digest;
  *  4. near-dup removal — inverted-index Jaccard pairs (doc_a < doc_b),
  *     then a [[SurvivorPolicy]]: greedy drop-doc_b by default
  *     (deterministic, one pass, no iteration), or connected-component
  *     representative assignment when one survivor per TRANSITIVE cluster
  *     is wanted (see the policy scaladoc for where they differ).
  */
object CorpusPipeline {

  /** Which docs of a near-dup pair graph get dropped.
    *
    *  - [[Greedy]] (default): drop every doc appearing as the higher id of
    *    a qualifying pair — one pass, no iteration. On a transitive chain
    *    A~B, B~C, A≁C it drops BOTH B and C even though C's only
    *    qualifying partner (B) is itself dropped.
    *  - [[ClusterRepresentative]]: connected components over the pair
    *    graph; only each cluster's minimum doc_id survives. One
    *    representative per TRANSITIVE duplicate cluster — the policy to
    *    pick when similarity is treated as transitive evidence of shared
    *    provenance (boilerplate families, mirror chains).
    *
    * The two differ on hub shapes: pairs (A,C),(B,C) with A≁B keep {A,B}
    * under Greedy but only {A} under ClusterRepresentative.
    */
  sealed trait SurvivorPolicy
  case object Greedy extends SurvivorPolicy
  case object ClusterRepresentative extends SurvivorPolicy

  /** @param ccMaxIter min-label round budget for [[ClusterRepresentative]]'s
    *                   distributed fallback (auto-scaled with vertex count;
    *                   raise for known long-chain graphs — see
    *                   [[graft.operators.ConnectedComponents.minLabel]])
    */
  final case class Params(
      minTokens: Int = 10,
      maxMeanTokenLen: Double = 12.0,
      nearDupJaccard: Double = 0.8,
      survivorPolicy: SurvivorPolicy = Greedy,
      ccMaxIter: Int = 25)

  /** Per-doc stats + quality/exact-survivor flags — the frame both the
    * cleaner and the leakage-free split assigner start from (one
    * definition, so the two can never disagree on eligibility).
    */
  private def statsWithFlags(docs: DataFrame, p: Params): DataFrame = {
    import graft.operators.Checkpoints.StableOps
    val toks = tokens(col("text"))
    // Metadata only — text is deliberately NOT carried through: this frame
    // is eagerly checkpointed below, and the checkpoint must materialize
    // the per-doc PROXY (stats + flags, ~60 bytes/row), never the payload
    // (guide §8: decide on small rows). Consumers that need text back
    // (the shingle-postings builder) re-attach it by a doc_id join against
    // the raw scan, which is cheap and prunes to (doc_id, text).
    val stats = docs.select(
      col("doc_id"), col("lang"),
      size(toks).as("n_tokens"),
      meanTokenLen(toks).as("mean_token_len"),
      md5(col("text")).as("digest"))

    val qualityOk = col("n_tokens") >= p.minTokens &&
      col("mean_token_len") <= p.maxMeanTokenLen

    // exact dedup: lowest doc_id per digest survives.
    // r16 left this stage LAZY ("ReuseExchange dedupes the identical
    // shuffle subtrees") — r17 plan audit showed it did NOT: the initial
    // physical plan for q_corpus_clean carried NINE copies of the
    // scan+tokenize+digest-window subtree (plans/r17/
    // q_corpus_clean_before.txt), one per consumer. One EAGER checkpoint
    // of the metadata frame pins it to a single computation.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("digest").orderBy("doc_id")
    stats
      .withColumn("exact_rank", row_number().over(w))
      .withColumn("exact_survivor", col("exact_rank") === 1)
      .drop("exact_rank")
      .withColumn("quality_ok", qualityOk)
      .stableCheckpoint()
  }

  /** Cleaned corpus with per-stage survival flags (so one pass computes both
    * the output and the funnel stats).
    */
  def cleanWithFlags(docs: DataFrame, p: Params = Params()): DataFrame = {
    val withExact = statsWithFlags(docs, p)

    // near-dup pairs over the quality-passing exact-survivors ONLY: if a
    // pair's lower-id member was already dropped upstream, its partner must
    // not also be dropped as doc_b — one representative per cluster survives
    val eligible = docs.select(col("doc_id"), col("text")).join(
      withExact.filter(col("quality_ok") && col("exact_survivor"))
        .select("doc_id"),
      "doc_id")
    val pairs = DedupQueries.nearDupPairs(eligible, p.nearDupJaccard)
    val victims = (p.survivorPolicy match {
      case Greedy =>
        pairs.select(col("doc_b").as("doc_id")).distinct()
      case ClusterRepresentative =>
        graft.operators.ConnectedComponents
          .minLabel(pairs.select("doc_a", "doc_b"), maxIter = p.ccMaxIter)
          .filter(col("id") =!= col("rep"))
          .select(col("id").as("doc_id"))
    }).withColumn("is_near_dup_victim", lit(true))

    withExact
      .join(victims, Seq("doc_id"), "left")
      .withColumn("survives",
        col("quality_ok") && col("exact_survivor") && col("is_near_dup_victim").isNull)
      .select("doc_id", "lang", "n_tokens", "mean_token_len", "digest",
        "quality_ok", "exact_survivor", "survives")
  }

  def clean(docs: DataFrame, p: Params = Params()): DataFrame =
    cleanWithFlags(docs, p).filter(col("survives"))
      .select("doc_id", "lang", "n_tokens")

  /** One-row funnel summary: input → quality gate → exact dedup → near-dup. */
  def funnel(docs: DataFrame, p: Params = Params()): DataFrame =
    cleanWithFlags(docs, p).agg(
      count(lit(1)).as("n_input"),
      sum(when(col("quality_ok"), 1).otherwise(0)).as("n_quality_ok"),
      sum(when(col("quality_ok") && col("exact_survivor"), 1).otherwise(0)).as("n_after_exact"),
      sum(when(col("survives"), 1).otherwise(0)).as("n_clean"),
      sum(when(col("survives"), col("n_tokens")).otherwise(0)).as("clean_tokens"))

  /** The pipeline through the qualifying near-dup pairs as one DuckDB CTE
    * chain — every stage is exact (integer token counts, md5 digests,
    * integer-ratio Jaccard), so the corpus cleaner is oracle-checkable end
    * to end. `WITH RECURSIVE` so the CC-policy oracle can extend the chain
    * with a transitive closure (harmless for the non-recursive uses).
    */
  private val pairsSql =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, lang, text,
      |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |stats AS (
      |  SELECT doc_id, lang, text, len(t) AS n_tokens,
      |         CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
      |           / NULLIF(CAST(len(t) AS DOUBLE), 0.0) AS mean_token_len,
      |         md5(text) AS digest,
      |         (len(t) >= 10 AND
      |          CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
      |            / NULLIF(CAST(len(t) AS DOUBLE), 0.0) <= 12.0) AS quality_ok,
      |         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS exact_survivor
      |  FROM toks),
      |eligible AS (
      |  SELECT doc_id, lang, text, n_tokens FROM stats WHERE quality_ok AND exact_survivor),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) >= 3
      |              THEN list_distinct(list_transform(generate_series(1, len(t)-2),
      |                                 i -> array_to_string(t[i:i+2], ' ')))
      |              ELSE [] END AS shingles
      |  FROM (SELECT doc_id,
      |               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS t
      |        FROM eligible)),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
      |qpairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT b.doc_id AS doc_b, a.doc_id AS doc_a, COUNT(*) AS n_inter
      |    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) p
      |  JOIN sizes sa ON p.doc_a = sa.doc_id
      |  JOIN sizes sb ON p.doc_b = sb.doc_id
      |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.8)
      |""".stripMargin

  /** Greedy policy: every doc_b of a qualifying pair is a victim. */
  private val funnelSql = pairsSql +
    """,victims AS (SELECT DISTINCT doc_b AS doc_id FROM qpairs)
      |""".stripMargin

  /** ClusterRepresentative policy: transitive closure over the pair graph;
    * a doc is a victim iff some SMALLER id is reachable (= it is not its
    * component's minimum). Mirrors [[graft.operators.ConnectedComponents]].
    */
  private val ccVictimsSql =
    """,edges AS (SELECT doc_a AS a, doc_b AS b FROM qpairs
      |           UNION ALL SELECT doc_b, doc_a FROM qpairs),
      |closure(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a),
      |victims AS (SELECT a AS doc_id FROM closure GROUP BY a HAVING MIN(b) < a)
      |""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_corpus_clean",
      funnelSql +
        """SELECT e.doc_id, e.lang, e.n_tokens
          |FROM eligible e LEFT JOIN victims v ON e.doc_id = v.doc_id
          |WHERE v.doc_id IS NULL
          |ORDER BY e.doc_id""".stripMargin) { (s, d) =>
      clean(Tables.documents(s, d)).orderBy("doc_id")
    },
    QueryDef(
      "q_corpus_clean_cc",
      pairsSql + ccVictimsSql +
        """SELECT e.doc_id, e.lang, e.n_tokens
          |FROM eligible e LEFT JOIN victims v ON e.doc_id = v.doc_id
          |WHERE v.doc_id IS NULL
          |ORDER BY e.doc_id""".stripMargin) { (s, d) =>
      clean(Tables.documents(s, d), Params(survivorPolicy = ClusterRepresentative))
        .orderBy("doc_id")
    },

    QueryDef(
      "q_corpus_funnel",
      funnelSql +
        """SELECT (SELECT COUNT(*) FROM stats) AS n_input,
          |       (SELECT COUNT(*) FROM stats WHERE quality_ok) AS n_quality_ok,
          |       (SELECT COUNT(*) FROM eligible) AS n_after_exact,
          |       (SELECT COUNT(*) FROM eligible e LEFT JOIN victims v ON e.doc_id = v.doc_id
          |        WHERE v.doc_id IS NULL) AS n_clean,
          |       CAST(COALESCE((SELECT SUM(e.n_tokens) FROM eligible e
          |        LEFT JOIN victims v ON e.doc_id = v.doc_id
          |        WHERE v.doc_id IS NULL), 0) AS BIGINT) AS clean_tokens""".stripMargin) { (s, d) =>
      funnel(Tables.documents(s, d))
    },

    // ----- End-to-end training export: funnel → greedy sequence packing --
    // The full nightly composition as ONE lazy DAG: quality gate → exact
    // dedup → near-dup removal (greedy), then the survivors pack into
    // 128-token training bins across 8 hash-sharded independent streams
    // (ChunkingQueries.packSequences — secondary-sorted groups, so packing
    // is deterministic under any input partitioning). The oracle extends
    // the funnel's CTE chain with the packer's RECURSIVE fold — the entire
    // export manifest is hash-gated end to end, not just its stages.
    //
    // Scale: everything before packing is the audited funnel; packing adds
    // one doc_id-keyed join (survivor ids back to text) and one grp-keyed
    // sorted-group pass. Nothing new shuffles more than once.
    QueryDef(
      "q_train_export",
      funnelSql +
        """,surv AS (
          |  SELECT e.doc_id, e.n_tokens FROM eligible e
          |  LEFT JOIN victims v ON e.doc_id = v.doc_id
          |  WHERE v.doc_id IS NULL),
          |ord AS (
          |  SELECT doc_id, doc_id % 8 AS grp, n_tokens AS nt,
          |         ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
          |  FROM surv),
          |pack(grp, rn, doc_id, nt, bin, used) AS (
          |  SELECT grp, rn, doc_id, nt, CAST(0 AS BIGINT), nt FROM ord WHERE rn = 1
          |  UNION ALL
          |  SELECT o.grp, o.rn, o.doc_id, o.nt,
          |         CASE WHEN p.used + o.nt > 128 THEN p.bin + 1 ELSE p.bin END,
          |         CASE WHEN p.used + o.nt > 128 THEN o.nt ELSE p.used + o.nt END
          |  FROM pack p JOIN ord o ON o.grp = p.grp AND o.rn = p.rn + 1)
          |SELECT doc_id, grp, bin AS bin_id, nt AS n_tokens
          |FROM pack
          |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val survivorIds = clean(docs).select("doc_id")
      ChunkingQueries.packSequences(
          docs.join(survivorIds, "doc_id"), budget = 128, nGroups = 8)
        .orderBy("doc_id")
    },

    // ----- leakage-free train/val/test split (cluster-level assignment) --
    // The eval-hygiene step a per-doc hash split gets WRONG: near-duplicate
    // documents hashed independently land in different splits, and the
    // model is then evaluated on paraphrases of its own training data. The
    // fix assigns whole NEAR-DUP CLUSTERS (the cleaner's connected
    // components over the Jaccard-0.8 pair graph; singletons are their own
    // cluster) to a split by hashing the CLUSTER id — members inherit it,
    // so no qualifying pair can ever straddle splits (SplitSpec asserts
    // exactly that over every pair). 80/10/10 via the 16-bit md5 prefix of
    // 'split:<cluster_id>' bucketed (h·10) DIV 65536 — integer-exact in
    // both engines. Scale: clustering is the cleaner's bounded CC; the
    // assignment itself is a map-side hash of a value already on the row —
    // no shuffle beyond the cleaner's own, at any corpus size.
    QueryDef(
      "q_split_leakfree",
      pairsSql +
        """,edges AS (SELECT doc_a AS a, doc_b AS b FROM qpairs
          |           UNION ALL SELECT doc_b, doc_a FROM qpairs),
          |closure(a, b) AS (
          |  SELECT a, b FROM edges
          |  UNION
          |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a),
          |mn AS (SELECT a AS doc_id, MIN(b) AS mn FROM closure GROUP BY a),
          |clu AS (SELECT e.doc_id, e.lang, e.n_tokens,
          |               LEAST(e.doc_id, COALESCE(m.mn, e.doc_id)) AS cluster_id
          |        FROM eligible e LEFT JOIN mn m ON e.doc_id = m.doc_id),
          |lab AS (SELECT *,
          |               (CAST(('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT) * 10) // 65536 AS b
          |        FROM clu)
          |SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
          |       lang, COUNT(*) AS n_docs,
          |       COUNT(DISTINCT cluster_id) AS n_clusters,
          |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
          |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      splitLeakfree(Tables.documents(s, d))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("cluster_id").as("n_clusters"),
          sum("n_tokens").cast("long").as("sum_tokens"))
        .orderBy("split", "lang")
    })

  /** Per-doc split assignment (doc_id, lang, n_tokens, cluster_id, split)
    * over the ELIGIBLE corpus — see q_split_leakfree. Exposed so SplitSpec
    * can assert the no-straddling invariant at pair granularity.
    */
  def splitLeakfree(docs: DataFrame, p: Params = Params()): DataFrame = {
    import org.apache.spark.sql.graft.SketchExpressions
    val withExact = statsWithFlags(docs, p)
    val eligible = withExact.filter(col("quality_ok") && col("exact_survivor"))
    val pairs = DedupQueries.nearDupPairs(
      docs.select(col("doc_id"), col("text"))
        .join(eligible.select("doc_id"), "doc_id"), p.nearDupJaccard)
    val cc = graft.operators.ConnectedComponents
      .minLabel(pairs.select("doc_a", "doc_b"), maxIter = p.ccMaxIter)
    eligible.select("doc_id", "lang", "n_tokens")
      .join(cc.select(col("id").as("doc_id"), col("rep")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("rep"), col("doc_id")))
      .withColumn("h8", SketchExpressions.md5Hi64(
        concat(lit("split:"), col("cluster_id").cast("string"))))
      .withColumn("b", expr("(shiftrightunsigned(h8, 48) * 10) DIV 65536"))
      .withColumn("split",
        when(col("b") < 8, "train").when(col("b") === 8, "val").otherwise("test"))
      .select("doc_id", "lang", "n_tokens", "cluster_id", "split")
  }
}
