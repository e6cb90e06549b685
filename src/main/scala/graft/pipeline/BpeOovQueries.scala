package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.{tokens, toksSql}
import org.apache.spark.sql.functions._

/** Inference-time (out-of-vocabulary) BPE encoding — the serving half of
  * the tokenizer (r14 verdict item 1, its top-next ask).
  *
  * q_bpe_encode tokenizes via an INNER join against the trained
  * vocabulary table: exact and fast for corpus words the trainer saw, but
  * it silently DROPS unseen words. A production tokenizer encodes text
  * the trainer never saw by replaying the persisted merge RULES in rank
  * order over the word's raw characters (Sennrich, Haddow & Birch 2016:
  * the learned merge list IS the tokenizer; serving applies the same
  * rank-ordered greedy folds training applied) — reference scope:
  * `/root/reference` ships no tokenizer, this is engine-own-claim
  * territory extending SURVEY.md §2's pipeline block.
  *
  * Gate shape (the verdict's): train on ONE source (src0), encode every
  * OTHER source plus a foreign corpus (the `part` table's p_name tokens
  * — a different domain whose alphabet genuinely exceeds the training
  * alphabet: 'z' never occurs in src0), with EXPLICIT OOV accounting:
  *
  *  - `n_oov_words`: token instances whose word is outside the trained
  *    vocabulary (the words q_bpe_encode's join would have dropped);
  *  - `n_oov_tokens`: emitted symbols outside the trained symbol
  *    inventory (base alphabet ∪ merge outputs) — the instances a real
  *    tokenizer maps to <unk>.
  *
  * Exactness: the whole replay is the [[BpeQueries.applyMergeExpr]]
  * greedy fold per rank — BpeOovSpec pins replay(train-corpus word) ==
  * the trained state's tokenization (the lookup path and the replay path
  * are the SAME function on seen words), and the DuckDB oracle replays
  * every rule application independently from the STAGED rule table
  * (match → greedy run-parity keep → reassemble, per rank), so a wrong
  * fold OR a wrong rule order breaks the hash.
  *
  * Scale shape (100 TB): rules are persisted once ([[BpeQueries.BpeVocabStore]])
  * and collected driver-side (R rows, R = merge count — bounded by the
  * tokenizer spec, never by the corpus); the replay runs over DISTINCT
  * corpus words (vocabulary-bounded, ~10⁶–10⁷ rows at any corpus size)
  * as R chained MAP-ONLY projections — each one whole-stage-codegen, no
  * shuffle (Catalyst keeps the chain as separate projects: each step's
  * output array is referenced several times by the next fold, which is
  * exactly the non-cheap-reference case CollapseProject refuses to
  * inline, so the plan stays linear in R — BpeOovSpec audits this). The
  * corpus side then broadcast-joins the encoded vocabulary, identical to
  * q_bpe_encode. At deep-trainer rule counts (30k+), serving replays one
  * [[BpeQueries.applyBatchExpr]] per PASS instead of one fold per rule —
  * same law, pass-batched (the deep trainer proves batches equal
  * rule-serial application).
  */
object BpeOovQueries {

  private val OovRounds = 8
  private val TrainSource = "src0"

  /** Rank-ordered greedy replay of `rules` over a `word` column: chars →
    * fold per rule. Map-only; one linear projection chain (see class doc).
    */
  private[pipeline] def replayEncode(words: org.apache.spark.sql.DataFrame,
      rules: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    rules.foldLeft(
      words.select(col("word"),
        expr("filter(split(word, ''), c -> c <> '')").as("syms"))) {
      case (df, (l, r)) =>
        df.select(col("word"), BpeQueries.applyMergeExpr(l, r).as("syms"))
    }

  /** The persisted (round, lsym, rsym) rule table trained on
    * [[TrainSource]] only — train-once-serve-forever via the vocab store;
    * staged for the oracle's independent replay.
    */
  private[pipeline] def trainedRules(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.OracleStage.stage("bpe_oov_rules",
      BpeQueries.BpeVocabStore.artifact(spark, d,
          s"oovrules_${TrainSource}_r$OovRounds")(
        BpeQueries.trainTrace(wordFreqA(spark, d), OovRounds, stage = false)
          .select(col("round"), col("lsym"), col("rsym"))))

  private def wordFreqA(spark: org.apache.spark.sql.SparkSession, d: String) =
    BpeQueries.wordFreq(spark, d, Some(TrainSource))

  /** The encode corpus: every non-training source's document tokens plus
    * the part table's p_name tokens as the foreign domain `part_names`.
    */
  private def encodeCorpus(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, d).filter(col("source") =!= TrainSource)
      .select(col("source").as("grp"), explode(tokens(col("text"))).as("word"))
      .unionByName(Tables.part(spark, d)
        .select(lit("part_names").as("grp"),
          explode(tokens(col("p_name"))).as("word")))
      .filter(col("word").rlike("^[a-z]+$"))

  /** One rule application, DuckDB side — the generic greedy law over the
    * staged rule of rank `k`: flag match positions (sym = l ∧ next = r),
    * group consecutive matches into runs (only possible for l = r), keep
    * the odd-ranked match of each run (the greedy ⌈run/2⌉ parity), emit
    * the merged symbol at kept positions, drop the position after a kept
    * one, reassemble in position order.
    */
  private def oovStepSql(k: Int): String =
    s"""rl$k AS (SELECT lsym AS l, rsym AS r, lsym || rsym AS m FROM rules WHERE round = $k),
       |e$k AS (SELECT word, unnest(syms) AS sym,
       |               unnest(generate_series(1, len(syms))) AS pos FROM s$k),
       |m$k AS (SELECT word, pos, sym,
       |               COALESCE(sym = (SELECT l FROM rl$k)
       |                 AND LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
       |                     = (SELECT r FROM rl$k), FALSE) AS mtch
       |        FROM e$k),
       |g$k AS (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY word, mtch ORDER BY pos) AS grp
       |        FROM m$k),
       |k$k AS (SELECT *, mtch AND (ROW_NUMBER() OVER (PARTITION BY word, mtch, grp ORDER BY pos) % 2 = 1) AS kept
       |        FROM g$k),
       |s${k + 1} AS (
       |  SELECT word, list(CASE WHEN kept THEN (SELECT m FROM rl$k) ELSE sym END ORDER BY pos) AS syms
       |  FROM (SELECT *, COALESCE(LAG(kept) OVER (PARTITION BY word ORDER BY pos), FALSE) AS pk
       |        FROM k$k)
       |  WHERE kept OR NOT pk
       |  GROUP BY word)""".stripMargin

  private def oracleSql: String = {
    val partToks = toksSql // toksSql reads a column named `text`
    s"""WITH rules AS (SELECT round, lsym, rsym FROM ${graft.OracleStage.pq("bpe_oov_rules")}),
       |corpus AS (
       |  SELECT grp, w AS word FROM (
       |    SELECT source AS grp, unnest($toksSql) AS w
       |    FROM documents WHERE source <> '$TrainSource') x
       |  WHERE w ~ '^[a-z]+$$'
       |  UNION ALL
       |  SELECT 'part_names' AS grp, w AS word FROM (
       |    SELECT unnest($partToks) AS w
       |    FROM (SELECT p_name AS text FROM part) p) y
       |  WHERE w ~ '^[a-z]+$$'),
       |w AS (SELECT DISTINCT word FROM corpus),
       |s0 AS (SELECT word, list_filter(regexp_split_to_array(word, ''), c -> c <> '') AS syms FROM w),
       |${(0 until OovRounds).map(oovStepSql).mkString(",\n")},
       |tw AS (SELECT DISTINCT word FROM (
       |         SELECT unnest($toksSql) AS word FROM documents
       |         WHERE source = '$TrainSource') t
       |       WHERE word ~ '^[a-z]+$$' AND len(word) >= 2),
       |inv AS (SELECT DISTINCT unnest(list_filter(regexp_split_to_array(word, ''), c -> c <> '')) AS s FROM tw
       |        UNION SELECT lsym || rsym FROM rules),
       |oovt AS (SELECT word, COUNT(*) AS c
       |         FROM (SELECT word, unnest(syms) AS s FROM s$OovRounds) x
       |         WHERE s NOT IN (SELECT s FROM inv) GROUP BY word),
       |enc AS (SELECT sN.word, len(sN.syms) AS n_sub, COALESCE(oovt.c, 0) AS n_oov,
       |               CASE WHEN tw.word IS NULL THEN 1 ELSE 0 END AS oovw
       |        FROM s$OovRounds sN
       |        LEFT JOIN oovt ON oovt.word = sN.word
       |        LEFT JOIN tw ON tw.word = sN.word)
       |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(oovw) AS BIGINT) AS n_oov_words,
       |       CAST(SUM(n_sub) AS BIGINT) AS n_tokens,
       |       CAST(SUM(n_oov) AS BIGINT) AS n_oov_tokens,
       |       (CAST(SUM(n_sub) AS BIGINT) * 1000) // COUNT(*) AS tokens_per_word_x1k
       |FROM corpus JOIN enc USING (word)
       |GROUP BY grp ORDER BY grp""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- OOV / inference-time BPE encode: rule replay + accounting -----
    QueryDef("q_bpe_encode_oov", oracleSql) { (spark, d) =>
      // the persisted rule table: R rows, R = merge count — a bounded
      // driver collect at ANY corpus size (like the per-round argmax)
      val rulesDf = trainedRules(spark, d)
      val rules = rulesDf.orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val trainWords = wordFreqA(spark, d).select("word")
      // trained symbol inventory: base alphabet ∪ merge outputs — bounded
      // by alphabet size + R, collected once (replay only ever emits
      // merge outputs or single chars, so OOV token ⇔ unseen base char)
      val alpha = trainWords
        .select(explode(expr("filter(split(word, ''), c -> c <> '')")).as("s"))
        .distinct().collect().map(_.getString(0))
      val inv = (alpha ++ rules.map { case (l, r) => l + r }).distinct.sorted
      val invLit = array(inv.map(lit): _*)

      val corpus = encodeCorpus(spark, d)
      // replay over DISTINCT words: vocabulary-bounded at any corpus size
      val enc = replayEncode(corpus.select("word").distinct(), rules)
        .withColumn("n_sub", size(col("syms")).cast("long"))
        .withColumn("n_oov",
          size(filter(col("syms"), s => !array_contains(invLit, s))).cast("long"))
        .join(broadcast(trainWords.withColumn("inv", lit(1))), Seq("word"), "left")
        .withColumn("oovw", when(col("inv").isNull, 1L).otherwise(0L))
        .select("word", "n_sub", "n_oov", "oovw")
      // corpus side: ONE broadcast join against the encoded vocabulary —
      // the corpus never shuffles (same shape as q_bpe_encode)
      corpus.join(broadcast(enc), "word")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_words"), sum("oovw").as("n_oov_words"),
          sum("n_sub").as("n_tokens"), sum("n_oov").as("n_oov_tokens"))
        .withColumn("tokens_per_word_x1k", expr("n_tokens * 1000 DIV n_words"))
        .orderBy("grp")
    })
}
