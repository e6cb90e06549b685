package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.{tokens, toksSql}
import org.apache.spark.sql.functions._

/** WordPiece encoding — the third tokenizer family next to rank-replay
  * BPE (q_bpe_encode_oov) and pass-batched deep BPE (q_bpe_encode_deep):
  * BERT-style greedy LONGEST-MATCH-FIRST segmentation (Wu et al. 2016)
  * against a piece inventory, with continuation pieces marked `##` and
  * whole-word `[UNK]` on any unmatchable position. Reference scope:
  * `/root/reference` ships no tokenizer — engine-own-claim territory
  * extending SURVEY.md §2's pipeline block.
  *
  * Piece inventory: derived from the SAME persisted BPE state the other
  * serving gates use (trained on src0 only — the OOV split): a word's
  * first subword contributes a plain piece, every later subword a `##`
  * continuation piece, plus every training-alphabet character in both
  * roles (the standard char-fallback that guarantees progress over the
  * training alphabet — so a src0 word can never go `[UNK]`, while a
  * foreign-alphabet word, e.g. a part name containing 'z', must).
  *
  * Encode = ONE map-only expression per DISTINCT word (not a fold per
  * rule like BPE replay): aggregate over char positions, each step
  * taking the longest vocab hit at the cursor via a max-length-first
  * COALESCE of map lookups keyed `<cont>|<substring>`. Distinct words
  * are vocabulary-bounded at any corpus size; the corpus side then
  * broadcast-joins the encoded vocabulary (the q_bpe_encode shape).
  *
  * Exactness: the vocab table is STAGED ([[graft.OracleStage]]) and the
  * DuckDB oracle re-runs the greedy longest-match as a recursive CTE
  * over (word, cursor) states — same tie law (length DESC, emit), same
  * failure law — so a wrong match length, wrong continuation role, or
  * wrong UNK decision breaks the hash. WordPieceSpec additionally
  * replays the greedy in plain Scala and pins the gate bit-for-bit.
  */
object WordPieceQueries {

  private val TrainSource = "src0"
  private val Rounds = 8

  /** The staged (piece, cont, emit) inventory — see class doc. */
  private[graft] def vocabTable(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val built = BpeQueries.BpeVocabStore.artifact(spark, d,
        s"wpvocab_${TrainSource}_r$Rounds") {
      val st = BpeQueries.trainedState(
        BpeQueries.wordFreq(spark, d, Some(TrainSource)), Rounds, stage = false)
      val fromSyms = st
        .select(posexplode(col("syms")).as(Seq("p", "piece")))
        .select(col("piece"), (col("p") > 0).as("cont"))
      val chars = st
        .select(explode(expr("filter(split(word, ''), c -> c <> '')")).as("piece"))
      val charBoth = chars.withColumn("cont", lit(false))
        .unionByName(chars.withColumn("cont", lit(true)))
      fromSyms.unionByName(charBoth).distinct()
        .select(col("piece"), col("cont"),
          when(col("cont"), concat(lit("##"), col("piece")))
            .otherwise(col("piece")).as("emit"))
    }
    graft.OracleStage.stage("wordpiece_vocab", built)
  }

  /** Greedy longest-match encode of a `word` column: returns a struct
    * (toks ARRAY<STRING>, unk BOOLEAN). One aggregate over char
    * positions; each step consumes ≥ 1 char or fails the word.
    */
  private[graft] def encodeExpr(vocab: Seq[(String, Boolean, String)])
      : org.apache.spark.sql.Column = {
    vocab.foreach { case (p, _, _) =>
      require(p.matches("^[a-z]+$"),
        s"WordPiece piece '$p' outside the [a-z]+ contract")
    }
    val maxLen = vocab.map(_._1.length).max
    val entries = vocab
      .map { case (p, c, e) => s"'${if (c) 1 else 0}|$p', '$e'" }.mkString(", ")
    // longest-first: the first non-null lookup wins; keys substr-truncate
    // at the word end, so an over-long probe simply matches the shorter
    // remainder piece (same result the exact-length probe would find)
    val cands = (maxLen to 1 by -1).map { l =>
      s"""try_element_at(map($entries),
         |  concat(IF(acc.pos = 1, '0|', '1|'), substr(word, acc.pos, $l)))""".stripMargin
    }.mkString(",\n")
    // let-binding idiom (see BpeQueries.applyBatchExpr): the matched piece
    // is used twice (emit + consumed length) — bind it once via a
    // 1-element transform, lambda CSE does not fire across use sites
    expr(
      s"""aggregate(
         |  sequence(1, length(word)),
         |  named_struct('pos', 1, 'toks', CAST(array() AS ARRAY<STRING>), 'failed', false),
         |  (acc, i) -> IF(acc.failed OR acc.pos > length(word), acc,
         |    element_at(transform(array(COALESCE($cands)), m ->
         |      IF(m IS NULL,
         |         named_struct('pos', acc.pos, 'toks', acc.toks, 'failed', true),
         |         named_struct('pos', acc.pos + length(replace(m, '#', '')),
         |                      'toks', concat(acc.toks, array(m)),
         |                      'failed', false))), 1)),
         |  acc -> IF(acc.failed,
         |            named_struct('toks', array('[UNK]'), 'unk', true),
         |            named_struct('toks', acc.toks, 'unk', false)))""".stripMargin)
  }

  /** The encode corpus — q_bpe_encode_oov's split: every non-training
    * source plus the part-name foreign domain.
    */
  private def encodeCorpus(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, d).filter(col("source") =!= TrainSource)
      .select(col("source").as("grp"), explode(tokens(col("text"))).as("word"))
      .unionByName(Tables.part(spark, d)
        .select(lit("part_names").as("grp"),
          explode(tokens(col("p_name"))).as("word")))
      .filter(col("word").rlike("^[a-z]+$"))

  /** Encoded distinct words: (word, pieces, unk) — shared by the gate and
    * WordPieceSpec's independent replay.
    */
  private[pipeline] def encodedWords(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val vocab = vocabTable(spark, d).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSeq
      .sortBy(v => (v._1, v._2))
    encodeCorpus(spark, d).select("word").distinct()
      .select(col("word"), encodeExpr(vocab).as("e"))
      .select(col("word"), col("e.toks").as("pieces"), col("e.unk").as("unk"))
  }

  /** One greedy step, DuckDB side: the longest (length DESC, emit) vocab
    * hit at the cursor, in the continuation role iff pos > 1.
    */
  private val stepMatchSql =
    """(SELECT emit FROM v WHERE v.cont = (e.pos > 1)
      |   AND v.piece = substr(e.word, e.pos, len(v.piece))
      | ORDER BY len(v.piece) DESC, emit LIMIT 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_wordpiece_encode",
      s"""WITH RECURSIVE v AS (SELECT piece, cont, emit FROM ${graft.OracleStage.pq("wordpiece_vocab")}),
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
         |enc AS (
         |  SELECT word, 1 AS pos, CAST([] AS VARCHAR[]) AS toks,
         |         FALSE AS failed, FALSE AS dn FROM w
         |  UNION ALL
         |  SELECT word,
         |         CASE WHEN m IS NULL THEN pos ELSE pos + len(ltrim(m, '#')) END,
         |         CASE WHEN m IS NULL THEN toks ELSE list_append(toks, m) END,
         |         m IS NULL,
         |         m IS NULL OR pos + len(ltrim(m, '#')) > len(word)
         |  FROM (SELECT e.word, e.pos, e.toks, $stepMatchSql AS m
         |        FROM enc e WHERE NOT e.dn) s),
         |fin AS (SELECT word,
         |               CASE WHEN failed THEN ['[UNK]'] ELSE toks END AS pieces,
         |               failed FROM enc WHERE dn),
         |per_grp AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(CASE WHEN failed THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
         |         CAST(SUM(len(pieces)) AS BIGINT) AS n_pieces,
         |         (CAST(SUM(len(pieces)) AS BIGINT) * 1000) // COUNT(*) AS pieces_per_word_x1k
         |  FROM corpus JOIN fin USING (word) GROUP BY 1),
         |top_piece AS (
         |  SELECT p AS piece, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(pieces) AS p
         |        FROM corpus JOIN fin USING (word))
         |  WHERE len(ltrim(p, '#')) >= 2 AND p <> '[UNK]'
         |  GROUP BY 1 ORDER BY cnt DESC, piece LIMIT 5)
         |SELECT grp, n_words, n_unk_words, n_pieces, pieces_per_word_x1k
         |FROM per_grp
         |UNION ALL
         |SELECT 'top:' || piece AS grp, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |       cnt, CAST(0 AS BIGINT)
         |FROM top_piece
         |ORDER BY grp""".stripMargin) { (spark, d) =>
      import graft.operators.Checkpoints.StableOps
      val fin = encodedWords(spark, d)
        .select(col("word"), col("pieces"), col("unk"),
          size(col("pieces")).cast("long").as("n_sub"))
      // the ONE corpus pass: collapse instances to (grp, word, cnt) —
      // map-side-combinable, vocabulary-bounded output — then join the
      // encoded words and checkpoint the bounded frame (two consumers
      // below; without the checkpoint each would replay the corpus scan)
      val j = encodeCorpus(spark, d).groupBy("grp", "word")
        .agg(count(lit(1)).as("cnt"))
        .join(broadcast(fin), "word")
        .stableCheckpoint()
      val perGrp = j.groupBy("grp")
        .agg(sum("cnt").as("n_words"),
          sum(when(col("unk"), col("cnt")).otherwise(0L)).as("n_unk_words"),
          sum(col("cnt") * col("n_sub")).as("n_pieces"))
        .select(col("grp"), col("n_words"), col("n_unk_words"), col("n_pieces"),
          expr("(n_pieces * 1000) DIV n_words").as("pieces_per_word_x1k"))
      val topPiece = j.select(col("cnt"), explode(col("pieces")).as("piece"))
        .filter(length(expr("replace(piece, '#', '')")) >= 2 && col("piece") =!= "[UNK]")
        .groupBy("piece").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("piece")).limit(5)
        .select(concat(lit("top:"), col("piece")).as("grp"),
          lit(0L).as("n_words"), lit(0L).as("n_unk_words"),
          col("cnt").as("n_pieces"), lit(0L).as("pieces_per_word_x1k"))
      perGrp.unionByName(topPiece).orderBy("grp")
    })
}
