package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.{tokens, toksSql}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization — the fourth tokenizer family (Kudo 2018, the
  * SentencePiece unigram model): each word takes its GLOBALLY OPTIMAL
  * segmentation under per-piece costs −log p(piece), found by Viterbi
  * dynamic programming — unlike BPE's merge-rank replay and WordPiece's
  * greedy longest-match, which are both locally greedy. Reference scope:
  * `/root/reference` ships no tokenizer — engine-own-claim territory.
  *
  * Piece inventory + costs: from the SAME persisted src0 BPE state the
  * other serving gates use — a piece's frequency is its corpus-weighted
  * occurrence count in the tokenized state (plus every training-alphabet
  * character, the char fallback), and its integer cost is
  * round(10⁶·ln(total/freq)), computed ONCE driver-side and STAGED
  * ([[graft.OracleStage]]) — both engines consume the same staged
  * integers, so the whole DP is BIGINT-exact cross-engine (the ln never
  * runs in either engine's SQL).
  *
  * Viterbi: dp[0] = 0; dp[j] = min over matching pieces ending at j of
  * dp[j−|p|] + cost(p), ties broken (score ASC, piece length DESC) via
  * the ×32 packed key (costs ≤ 2·10⁷, words ≤ 32 chars → packed values
  * ≤ 2⁶³ with the 10¹⁵ INF band included); a word is [UNK] iff dp[len]
  * is in the INF band (reachable only through a foreign-alphabet char).
  * Spark runs dp + backtrace as TWO aggregate-HOF expressions over the
  * DISTINCT words (vocabulary-bounded at any corpus size — the corpus
  * side broadcast-joins the encoded words, the q_bpe_encode shape); the
  * DuckDB oracle replays dp as a recursive CTE whose per-position argmin
  * is a correlated SCALAR subquery (see the in-oracle comment on why not
  * LATERAL) and the backtrace as a second recursive walk, so a wrong DP
  * cell, tie, or backtrace step breaks the hash. UnigramSpec replays
  * Viterbi independently in Scala and pins optimality (gate cost ≤ any
  * segmentation's cost, e.g. the all-chars one).
  */
object UnigramQueries {

  private val TrainSource = "src0"
  private val Rounds = 8
  private val Inf = 1000000000000000L // INF band: no valid segmentation

  /** The staged (piece, cost) inventory — see class doc. */
  private[graft] def costTable(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val built = BpeQueries.BpeVocabStore.artifact(spark, d,
        s"unicost_${TrainSource}_r$Rounds") {
      val st = BpeQueries.trainedState(
        BpeQueries.wordFreq(spark, d, Some(TrainSource)), Rounds, stage = false)
      val sub = st.select(col("freq"), explode(col("syms")).as("piece"))
      val chars = st.select(col("freq"),
          explode(expr("filter(split(word, ''), c -> c <> '')")).as("piece"))
      val freqs = sub.unionByName(chars)
        .groupBy("piece").agg(sum("freq").as("f")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val total = freqs.map(_._2).sum.toDouble
      val costs = freqs.toSeq.sortBy(_._1).map { case (p, f) =>
        (p, math.round(1e6 * math.log(total / f.toDouble)))
      }
      costs.toDF("piece", "cost")
    }
    graft.OracleStage.stage("unigram_costs", built)
  }

  /** Viterbi encode of a `word` column from a driver-side inventory:
    * struct (toks ARRAY<STRING>, unk BOOLEAN, cost BIGINT).
    */
  private[graft] def encodeExpr(costs: Seq[(String, Long)])
      : org.apache.spark.sql.Column = {
    costs.foreach { case (p, _) =>
      require(p.matches("^[a-z]+$"),
        s"unigram piece '$p' outside the [a-z]+ contract")
    }
    val maxLen = costs.map(_._1.length).max
    require(maxLen < 32, s"piece length $maxLen breaks the x32 tie packing")
    val entries = costs
      .map { case (p, c) => s"'$p', CAST($c AS BIGINT)" }.mkString(", ")
    // packed candidate for piece length l ending at position j:
    // (dp[j-l] + cost) * 32 + (maxLen - l) — min = (score ASC, l DESC)
    val cands = (1 to maxLen).map { l =>
      s"""IF(j >= $l,
         |   (element_at(acc.dp, j - $l + 1)
         |    + try_element_at(map($entries), substr(word, j - $l + 1, $l))) * 32
         |   + ${maxLen - l},
         |   CAST(NULL AS BIGINT))""".stripMargin
    }.mkString(",\n")
    val dpExpr =
      s"""aggregate(
         |  sequence(1, length(word)),
         |  named_struct('dp', array(CAST(0 AS BIGINT)), 'bp', CAST(array() AS ARRAY<INT>)),
         |  (acc, j) -> element_at(transform(array(least($cands)), best ->
         |    IF(best IS NULL,
         |       named_struct('dp', concat(acc.dp, array(CAST($Inf AS BIGINT) + element_at(acc.dp, j))),
         |                    'bp', concat(acc.bp, array(0))),
         |       named_struct('dp', concat(acc.dp, array(best DIV 32)),
         |                    'bp', concat(acc.bp, array($maxLen - CAST(best % 32 AS INT)))))), 1),
         |  acc -> acc)""".stripMargin
    // backtrace: walk bp from the end; ≤ length(word) steps. UNK iff the
    // final dp cell sits in the INF band.
    expr(
      s"""element_at(transform(array($dpExpr), st ->
         |  IF(element_at(st.dp, length(word) + 1) >= CAST($Inf AS BIGINT),
         |     named_struct('toks', array('[UNK]'), 'unk', true,
         |                  'cost', CAST(0 AS BIGINT)),
         |     named_struct(
         |       'toks', aggregate(
         |         sequence(1, length(word)),
         |         named_struct('p', length(word), 'toks', CAST(array() AS ARRAY<STRING>)),
         |         (acc, i) -> IF(acc.p <= 0, acc,
         |           named_struct(
         |             'p', acc.p - element_at(st.bp, acc.p),
         |             'toks', concat(
         |               array(substr(word, acc.p - element_at(st.bp, acc.p) + 1,
         |                            element_at(st.bp, acc.p))),
         |               acc.toks))),
         |         a -> a.toks),
         |       'unk', false,
         |       'cost', element_at(st.dp, length(word) + 1)))), 1)""".stripMargin)
  }

  /** The encode corpus — the OOV split shared with q_bpe_encode_oov and
    * q_wordpiece_encode: non-training sources + part names.
    */
  private def encodeCorpus(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, d).filter(col("source") =!= TrainSource)
      .select(col("source").as("grp"), explode(tokens(col("text"))).as("word"))
      .unionByName(Tables.part(spark, d)
        .select(lit("part_names").as("grp"),
          explode(tokens(col("p_name"))).as("word")))
      .filter(col("word").rlike("^[a-z]+$"))

  /** Encoded distinct words: (word, pieces, unk, cost) — shared by the
    * gate and UnigramSpec's independent Viterbi replay.
    */
  private[pipeline] def encodedWords(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val costs = costTable(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    encodeCorpus(spark, d).select("word").distinct()
      .select(col("word"), encodeExpr(costs).as("e"))
      .select(col("word"), col("e.toks").as("pieces"), col("e.unk").as("unk"),
        col("e.cost").as("cost"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_unigram_encode",
      s"""WITH RECURSIVE v AS (SELECT piece, cost FROM ${graft.OracleStage.pq("unigram_costs")}),
         |mx AS (SELECT MAX(len(piece)) AS m FROM v),
         |corpus AS (
         |  SELECT grp, w AS word FROM (
         |    SELECT source AS grp, unnest($toksSql) AS w
         |    FROM documents WHERE source <> '$TrainSource') x
         |  WHERE w ~ '^[a-z]+$$'
         |  UNION ALL
         |  SELECT 'part_names' AS grp, w AS word FROM (
         |    SELECT unnest($toksSql) AS w
         |    FROM (SELECT p_name AS text FROM part) p) y
         |  WHERE w ~ '^[a-z]+$$'),
         |w AS (SELECT DISTINCT word FROM corpus),
         |dp AS (
         |  SELECT word, 0 AS j, [CAST(0 AS BIGINT)] AS dps, CAST([] AS INT[]) AS bps
         |  FROM w
         |  UNION ALL
         |  -- correlated SCALAR subquery, not LATERAL: DuckDB's lateral
         |  -- decorrelation of an aggregate drops the zero-match rows a
         |  -- foreign-alphabet position produces (the word then silently
         |  -- vanishes); a scalar subquery yields NULL there instead
         |  SELECT word, j + 1,
         |         list_append(dps, CASE WHEN pk IS NULL
         |           THEN $Inf + dps[j + 1] ELSE pk // 32 END),
         |         list_append(bps, CASE WHEN pk IS NULL
         |           THEN 0 ELSE mxm - CAST(pk % 32 AS INT) END)
         |  FROM (
         |    SELECT d.word, d.j, d.dps, d.bps, m.m AS mxm,
         |           (SELECT MIN((d.dps[d.j + 2 - len(piece)] + cost) * 32
         |                       + (m.m - len(piece)))
         |            FROM v WHERE len(piece) <= d.j + 1
         |              AND piece = substr(d.word, d.j + 2 - len(piece), len(piece))) AS pk
         |    FROM dp d, mx m WHERE d.j < len(d.word)) s),
         |fin AS (SELECT word, dps, bps,
         |               dps[len(word) + 1] >= $Inf AS unk,
         |               CASE WHEN dps[len(word) + 1] >= $Inf THEN 0
         |                    ELSE dps[len(word) + 1] END AS cost
         |        FROM dp WHERE j = len(word)),
         |bt AS (
         |  SELECT word, bps, unk, cost, len(word) AS p,
         |         CASE WHEN unk THEN ['[UNK]'] ELSE CAST([] AS VARCHAR[]) END AS toks
         |  FROM fin
         |  UNION ALL
         |  SELECT word, bps, unk, cost, p - bps[p],
         |         list_prepend(substr(word, p - bps[p] + 1, bps[p]), toks)
         |  FROM bt WHERE NOT unk AND p > 0),
         |seg AS (SELECT word, unk, cost, toks AS pieces FROM bt
         |        WHERE p = 0 OR unk),
         |per_grp AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(CASE WHEN unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
         |         CAST(SUM(len(pieces)) AS BIGINT) AS n_pieces,
         |         CAST(SUM(cost) AS BIGINT) AS cost_sum,
         |         (CAST(SUM(len(pieces)) AS BIGINT) * 1000) // COUNT(*) AS pieces_per_word_x1k
         |  FROM corpus JOIN seg USING (word) GROUP BY 1),
         |top_piece AS (
         |  SELECT pc AS piece, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(pieces) AS pc FROM corpus JOIN seg USING (word))
         |  WHERE len(pc) >= 2 AND pc <> '[UNK]'
         |  GROUP BY 1 ORDER BY cnt DESC, piece LIMIT 5)
         |SELECT grp, n_words, n_unk_words, n_pieces, cost_sum, pieces_per_word_x1k
         |FROM per_grp
         |UNION ALL
         |SELECT 'top:' || piece AS grp, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |       cnt, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |FROM top_piece
         |ORDER BY grp""".stripMargin) { (spark, d) =>
      import graft.operators.Checkpoints.StableOps
      val seg = encodedWords(spark, d)
        .select(col("word"), col("pieces"), col("unk"), col("cost"),
          size(col("pieces")).cast("long").as("n_sub"))
      // ONE corpus pass to (grp, word, cnt) — map-side-combinable,
      // vocabulary-bounded — then the bounded join is checkpointed for
      // its two consumers (the WordPiece gate's shape)
      val j = encodeCorpus(spark, d).groupBy("grp", "word")
        .agg(count(lit(1)).as("cnt"))
        .join(broadcast(seg), "word")
        .stableCheckpoint()
      val perGrp = j.groupBy("grp")
        .agg(sum("cnt").as("n_words"),
          sum(when(col("unk"), col("cnt")).otherwise(0L)).as("n_unk_words"),
          sum(col("cnt") * col("n_sub")).as("n_pieces"),
          sum(col("cnt") * col("cost")).as("cost_sum"))
        .select(col("grp"), col("n_words"), col("n_unk_words"), col("n_pieces"),
          col("cost_sum"),
          expr("(n_pieces * 1000) DIV n_words").as("pieces_per_word_x1k"))
      val topPiece = j.select(col("cnt"), explode(col("pieces")).as("piece"))
        .filter(length(col("piece")) >= 2 && col("piece") =!= "[UNK]")
        .groupBy("piece").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("piece")).limit(5)
        .select(concat(lit("top:"), col("piece")).as("grp"),
          lit(0L).as("n_words"), lit(0L).as("n_unk_words"),
          col("cnt").as("n_pieces"), lit(0L).as("cost_sum"),
          lit(0L).as("pieces_per_word_x1k"))
      perGrp.unionByName(topPiece).orderBy("grp")
    })
}
