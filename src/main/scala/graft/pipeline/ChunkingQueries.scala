package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-window preparation for training/embedding pipelines:
  *
  *  1. stride CHUNKING — each document becomes overlapping fixed-size token
  *     windows (the RAG-embedding / training-window splitter). Purely
  *     declarative (`sequence` starts + `slice` per window), map-only: no
  *     shuffle at all, output volume = tokens × (window/stride) overlap
  *     factor regardless of corpus size.
  *  2. greedy sequence PACKING — short documents are packed contiguously
  *     into token-budget bins (LLM pretraining sample packing: unfilled
  *     context is wasted compute). Packing is inherently sequential (each
  *     bin boundary depends on the running remainder), so it cannot be a
  *     window function; the scale shape is hash-grouped INDEPENDENT packing
  *     streams with `flatMapSortedGroups` — Spark's secondary sort hands
  *     each group's docs in doc_id order WITHOUT materializing the group,
  *     so a group can exceed memory and the greedy fold still streams.
  *     Groups pack in parallel; determinism comes from the (grp, doc_id)
  *     order, not from task scheduling.
  */
object ChunkingQueries {

  /** Overlapping token windows of `window` tokens every `stride` tokens.
    * Output: (doc_id, chunk_id, n_tokens, chunk_digest).
    */
  def strideChunks(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"strideChunks($window,$stride): need 0 < stride <= window")
    docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .withColumn("start",
        explode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        slice(col("t"), col("start") + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_digest"))
  }

  /** Greedy token-budget packing: within each of `nGroups` independent
    * streams (docs in doc_id order), a doc opens a new bin iff it does not
    * fit the current one; oversized docs (> budget tokens) occupy a bin
    * alone, untruncated. Output: (doc_id, grp, bin_id, n_tokens).
    */
  def packSequences(docs: DataFrame, budget: Int, nGroups: Int): DataFrame = {
    require(budget > 0 && nGroups > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(nGroups.toLong)).as("grp"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("nt"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapSortedGroups(col("doc_id")) { (grp, it) =>
        var bin = 0L
        var used = 0L
        var first = true
        it.map { case (docId, _, nt) =>
          if (!first && used + nt > budget) { bin += 1; used = nt }
          else { used += nt; first = false }
          (docId, grp, bin, nt)
        }
      }
      .toDF("doc_id", "grp", "bin_id", "n_tokens")
  }

  /** [[packSequences]] continuing each group from a persisted (bin, used)
    * tail — the batch-arrival form: yesterday's corpus packed yesterday,
    * tonight's docs continue the SAME greedy fold from the stored per-group
    * state, and the result provably equals a full repack of the union
    * (greedy packing is prefix-stable). Input is pre-tokenized
    * (doc_id, n_tokens); `state` maps grp → (last bin, tokens used in it)
    * — ≤ nGroups entries, a driver-side literal, never corpus-sized.
    */
  def packSequencesResume(docNt: DataFrame, budget: Int, nGroups: Int,
      state: Map[Long, (Long, Long)]): DataFrame = {
    require(budget > 0 && nGroups > 0)
    require(state.keys.forall(g => g >= 0 && g < nGroups), s"state has a grp outside [0, $nGroups)")
    val spark = docNt.sparkSession
    import spark.implicits._
    docNt.select(col("doc_id"),
        pmod(col("doc_id"), lit(nGroups.toLong)).as("grp"),
        col("n_tokens").cast("long").as("nt"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapSortedGroups(col("doc_id")) { (grp, it) =>
        var (bin, used) = state.getOrElse(grp, (0L, 0L))
        var first = !state.contains(grp)
        it.map { case (docId, _, nt) =>
          if (!first && used + nt > budget) { bin += 1; used = nt }
          else { used += nt; first = false }
          (docId, grp, bin, nt)
        }
      }
      .toDF("doc_id", "grp", "bin_id", "n_tokens")
  }

  private val toksSql = graft.functions.TextFunctions.toksSql

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_chunk_overlap",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |starts AS (
         |  SELECT doc_id, toks, unnest(generate_series(0, GREATEST(len(toks)-1, 0), 24)) AS s
         |  FROM t)
         |SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
         |       CAST(len(toks[s+1 : s+32]) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(toks[s+1 : s+32], ' ')) AS chunk_digest
         |FROM starts
         |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      strideChunks(Tables.documents(s, d), window = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // greedy packing vs a DuckDB RECURSIVE-CTE mirror of the same fold:
    // per group (doc_id % 8), row k's bin/remainder derive from row k-1's
    QueryDef(
      "q_pack_sequences",
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, doc_id % 8 AS grp, CAST(len($toksSql) AS BIGINT) AS nt
         |  FROM documents),
         |ord AS (
         |  SELECT doc_id, grp, nt,
         |         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
         |  FROM d),
         |pack(grp, rn, doc_id, nt, bin, used) AS (
         |  SELECT grp, rn, doc_id, nt, CAST(0 AS BIGINT), nt FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT o.grp, o.rn, o.doc_id, o.nt,
         |         CASE WHEN p.used + o.nt > 64 THEN p.bin + 1 ELSE p.bin END,
         |         CASE WHEN p.used + o.nt > 64 THEN o.nt ELSE p.used + o.nt END
         |  FROM pack p JOIN ord o ON o.grp = p.grp AND o.rn = p.rn + 1)
         |SELECT doc_id, grp, bin AS bin_id, nt AS n_tokens
         |FROM pack
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      packSequences(Tables.documents(s, d), budget = 64, nGroups = 8)
        .orderBy("doc_id")
    })
}
