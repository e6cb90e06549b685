package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions._
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end INCREMENTAL corpus pipeline — the nightly batch-arrival
  * flow production actually runs, chaining the isolated incremental faces
  * (dedup-vs-index, budget refill, resumable packing) into ONE gate:
  *
  *   clean (quality gate) → exact dedup vs the persisted digest index →
  *   decontaminate vs the persisted benchmark digests → near-dup vs the
  *   persisted shingle index → token-budget refill against the persisted
  *   fill totals → sequence-pack continuing the persisted per-group bins.
  *
  * Semantics are ARRIVAL-ORDER FIRST-WINS throughout (precedence key
  * (is_batch, doc_id): everything already in the corpus precedes tonight's
  * batch): the exact survivor is the earliest arrival per digest, a doc is
  * a near-dup victim iff some earlier ELIGIBLE doc is a Jaccard-0.8 pair,
  * selection is a greedy prefix fill to the capacity
  * `base_clean_tokens + base_clean_tokens DIV 10` (the corpus plus 10%
  * growth headroom — refilled by arrivals), and packing is the greedy
  * 128-token fold. Every stage is PREFIX-STABLE under that order, which is
  * the whole point: processing ONLY the batch against persisted base state
  * provably equals a full recompute over the union corpus — and the
  * DuckDB oracle IS that full recompute (stats → flags → eligibility →
  * pair graph → greedy fill window → recursive pack fold over all docs),
  * so the driver's hash gate proves batch == full, not merely that two
  * incremental implementations agree.
  *
  * Scale shape: the serving run scans the ARRIVAL CHUNK once (checkpointed
  * after the per-doc stats), reads base state only from the persisted
  * artifacts (digest set, benchmark digests, eligible shingle postings
  * with sizes, packed manifest, per-group pack tails, fill totals — all
  * keyed by corpus fingerprint via the BpeVocabStore pattern, so a corpus
  * change invalidates them), and never re-ranks, re-pairs, or re-packs the
  * base. IncrementalPipelineSpec audits exactly that: the served plan
  * contains the artifact scans and NO base-corpus scan, and a second
  * invocation trains zero artifacts.
  */
object IncrementalPipelineQueries {

  private val BatchMod = 23 // doc_id % 23 == 0 → tonight's arrivals
  private val EvalMod = 89 // base docs with doc_id % 89 == 0 → the benchmark
  private val MinJ = 0.8
  private val PackBudget = 128
  private val NGroups = 8
  private val StoreKey = s"pipe_b${BatchMod}_e${EvalMod}_j08_p${PackBudget}_g$NGroups"

  private def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Per-doc stats + quality flag (mirrors CorpusPipeline's cleaner gate:
    * ≥10 tokens, mean token length ≤ 12).
    */
  private def statsOf(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        meanTokenLen(toks).as("mean_token_len"),
        md5(col("text")).as("digest"))
      .withColumn("quality_ok",
        col("n_tokens") >= 10 && col("mean_token_len") <= 12.0)
  }

  /** Base-state artifacts, each built at most once per corpus fingerprint
    * (BpeVocabStore.artifact): digest index, benchmark digests, eligible
    * shingle postings (+sizes), packed manifest, per-group pack tails,
    * fill totals. The build runs the FULL pipeline over the base side —
    * the one-time cost every standing index pays; serving reads parquet.
    */
  private def baseState(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import BpeQueries.BpeVocabStore.artifact
    // Shared across the artifact closures, LAZY so nothing runs when the
    // state is already on disk; checkpointed so the one-time build scans
    // the base corpus once instead of once per artifact (the un-shared
    // form measured 93 s vs ~20 s at sf0.01).
    lazy val bStatsCk = statsOf(
      Tables.documents(s, d).select("doc_id", "text")
        .filter(pmod(col("doc_id"), lit(BatchMod)) =!= 0))
      .stableCheckpoint()
    lazy val evalSet = bStatsCk
      .filter(pmod(col("doc_id"), lit(EvalMod)) === 0)
      .select("digest").distinct()
    // eligible base docs: quality + exact-first-per-digest + decontaminated
    lazy val bEligCk = {
      val w = Window.partitionBy("digest").orderBy("doc_id")
      bStatsCk.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1 && col("quality_ok"))
        .join(evalSet, Seq("digest"), "left_anti")
        .select("doc_id", "text", "n_tokens")
        .stableCheckpoint()
    }
    val digests = artifact(s, d, s"${StoreKey}_digests")(
      bStatsCk.select("digest").distinct())
    val evalDig = artifact(s, d, s"${StoreKey}_eval")(evalSet)
    val postings = artifact(s, d, s"${StoreKey}_postings") {
      val sh = DedupQueries.shinglePostings(bEligCk.select("doc_id", "text"))
      sh.join(sh.groupBy("doc_id").agg(count(lit(1)).as("n")), "doc_id")
    }
    val manifest = artifact(s, d, s"${StoreKey}_manifest") {
      // greedy arrival-order near-dup over the base = drop every doc with
      // an earlier eligible Jaccard pair (CorpusPipeline.Greedy precedence)
      val victims = DedupQueries.nearDupPairs(bEligCk.select("doc_id", "text"), MinJ)
        .select(col("doc_b").as("doc_id")).distinct()
      val clean = bEligCk.join(victims, Seq("doc_id"), "left_anti")
        .select("doc_id", "n_tokens")
      // capacity exceeds the base by construction, so the whole base packs
      ChunkingQueries.packSequencesResume(clean, PackBudget, NGroups, Map.empty)
    }
    val state = artifact(s, d, s"${StoreKey}_state") {
      // per-group tail: the manifest's last bin and the tokens it holds
      manifest.groupBy("grp").agg(max("bin_id").as("bin"))
        .join(manifest.withColumnRenamed("bin_id", "bin"), Seq("grp", "bin"))
        .groupBy("grp", "bin").agg(sum("n_tokens").as("used"))
    }
    val totals = artifact(s, d, s"${StoreKey}_totals")(
      manifest.agg(sum("n_tokens").as("base_total"))
        .select(col("base_total"),
          (col("base_total") + expr("base_total DIV 10")).as("budget")))
    (digests, evalDig, postings, manifest, state, totals)
  }

  /** The serving flow: ONE batch against the persisted state. Exposed for
    * the spec's plan audit and equality replay.
    */
  private[graft] def incrementalRun(s: SparkSession, d: String): DataFrame = {
    val (digests, evalDig, postings, manifest, state, totals) = baseState(s, d)
    val batch = Tables.documents(s, d).select("doc_id", "text")
      .filter(pmod(col("doc_id"), lit(BatchMod)) === 0)
    // one linear chain into `elig`, whose eager checkpoint below is the
    // single point where the arrival chunk materializes — the chunk is
    // scanned once and the serving plan's only table scans are artifacts
    val bt = statsOf(batch)

    // exact dedup vs the digest index, then first-wins WITHIN the batch;
    // the rank runs over all batch docs (a quality-failing earlier dup
    // still shadows a later one — same rule as the full recompute), the
    // quality gate applies after
    val w = Window.partitionBy("digest").orderBy("doc_id")
    val elig = bt
      .join(digests, Seq("digest"), "left_anti")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("quality_ok"))
      .join(evalDig, Seq("digest"), "left_anti") // decontaminate
      .select("doc_id", "text", "n_tokens")
      .stableCheckpoint() // bounded by the ingestion contract: an arrival
                          // chunk, never the corpus — read by 4 consumers

    // near-dup vs the persisted index + earlier in-batch docs (the
    // q_dedup_incremental shape, with the index side read from parquet:
    // postings carry their sizes so the index is never re-aggregated)
    val incSh = DedupQueries.shinglePostings(elig.select("doc_id", "text"))
    val sh = postings.withColumn("src", lit(0))
      .unionByName(incSh
        .join(incSh.groupBy("doc_id").agg(count(lit(1)).as("n")), "doc_id")
        .withColumn("src", lit(1)))
    // pairable shingles: in ≥2 docs AND ≥1 incoming (an index-only shingle
    // cannot produce an eligible pair, however common it is in the index)
    val pairable = sh.groupBy("sh")
      .agg(count(lit(1)).as("df"), max(col("src")).as("has_inc"))
      .filter(col("df") > 1 && col("has_inc") === 1)
      .select("sh")
    val shared = sh.join(pairable, "sh")
    val precedes = (col("a.src") < col("b.src")) ||
      (col("a.src") === col("b.src") && col("a.doc_id") < col("b.doc_id"))
    val victims = shared.as("a").join(shared.as("b"),
        col("a.sh") === col("b.sh") && col("b.src") === 1 && precedes &&
          least(col("a.n"), col("b.n")) >= lit(MinJ) * greatest(col("a.n"), col("b.n")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")) >= MinJ)
      .select(col("doc_b").as("doc_id")).distinct()

    // budget refill: greedy prefix fill of the capacity headroom — the
    // base's own fill never re-ranks (its running totals are below the
    // persisted base_total by prefix-stability), so only the batch ranks
    val clean = elig.join(victims, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_tokens")
    val filled = graft.operators.PrefixRank.withRunningTotal(clean,
        Seq(col("doc_id")), col("n_tokens"), "cum", shufflePartitions(s))
      .crossJoin(broadcast(totals)) // 1-row build side
      .filter(col("cum") + col("base_total") <= col("budget"))
      .select("doc_id", "n_tokens")

    // resume packing from the persisted per-group tails (≤ NGroups rows —
    // a bounded driver-side collect by construction)
    val tails = state.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val packed = ChunkingQueries.packSequencesResume(
      filled, PackBudget, NGroups, tails)

    manifest.unionByName(packed).orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pipeline_incremental",
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, (doc_id % $BatchMod = 0) AS is_batch, text,
         |         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
         |  FROM documents),
         |stats AS (
         |  SELECT doc_id, is_batch, t, CAST(len(t) AS BIGINT) AS n_tokens,
         |         md5(text) AS digest,
         |         (len(t) >= 10 AND
         |          CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
         |            / NULLIF(CAST(len(t) AS DOUBLE), 0.0) <= 12.0) AS quality_ok,
         |         ROW_NUMBER() OVER (PARTITION BY md5(text)
         |                            ORDER BY is_batch, doc_id) = 1 AS exact_survivor
         |  FROM toks),
         |evald AS (SELECT DISTINCT digest FROM stats
         |          WHERE NOT is_batch AND doc_id % $EvalMod = 0),
         |elig AS (
         |  SELECT s.doc_id, s.is_batch, s.t, s.n_tokens FROM stats s
         |  LEFT JOIN evald e ON s.digest = e.digest
         |  WHERE s.quality_ok AND s.exact_survivor AND e.digest IS NULL),
         |sh AS (
         |  SELECT doc_id, is_batch,
         |         CASE WHEN len(t) >= 3
         |              THEN list_distinct(list_transform(generate_series(1, len(t)-2),
         |                                 i -> array_to_string(t[i:i+2], ' ')))
         |              ELSE [] END AS shingles
         |  FROM elig),
         |ex AS (SELECT doc_id, is_batch, unnest(shingles) AS s FROM sh),
         |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
         |victims AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM (
         |    SELECT b.doc_id AS doc_b, a.doc_id AS doc_a, COUNT(*) AS n_inter
         |    FROM ex a JOIN ex b ON a.s = b.s
         |      AND (a.is_batch < b.is_batch OR (a.is_batch = b.is_batch AND a.doc_id < b.doc_id))
         |    GROUP BY 1, 2) p
         |  JOIN sizes sa ON p.doc_a = sa.doc_id
         |  JOIN sizes sb ON p.doc_b = sb.doc_id
         |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= $MinJ),
         |clean AS (
         |  SELECT e.doc_id, e.is_batch, e.n_tokens FROM elig e
         |  LEFT JOIN victims v ON e.doc_id = v.doc_id WHERE v.doc_id IS NULL),
         |cap AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN NOT is_batch THEN n_tokens END), 0) AS BIGINT) AS base_total
         |  FROM clean),
         |sel AS (
         |  SELECT doc_id, n_tokens FROM (
         |    SELECT doc_id, n_tokens,
         |           SUM(n_tokens) OVER (ORDER BY is_batch, doc_id
         |                               ROWS UNBOUNDED PRECEDING) AS cum
         |    FROM clean) c, cap
         |  WHERE cum <= base_total + base_total // 10),
         |ord AS (
         |  SELECT doc_id, doc_id % $NGroups AS grp, n_tokens AS nt,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id % $NGroups
         |                            ORDER BY (doc_id % $BatchMod = 0), doc_id) AS rn
         |  FROM sel),
         |pack(grp, rn, doc_id, nt, bin, used) AS (
         |  SELECT grp, rn, doc_id, nt, CAST(0 AS BIGINT), nt FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT o.grp, o.rn, o.doc_id, o.nt,
         |         CASE WHEN p.used + o.nt > $PackBudget THEN p.bin + 1 ELSE p.bin END,
         |         CASE WHEN p.used + o.nt > $PackBudget THEN o.nt ELSE p.used + o.nt END
         |  FROM pack p JOIN ord o ON o.grp = p.grp AND o.rn = p.rn + 1)
         |SELECT doc_id, grp, bin AS bin_id, nt AS n_tokens
         |FROM pack ORDER BY doc_id""".stripMargin) { (s, d) =>
      incrementalRun(s, d)
    })
}
