package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID, fingerprinting, exact dedup.
  * All per-document work is embarrassingly parallel map-side expression
  * evaluation — zero shuffles except the final (tiny) aggregations.
  */
object TextPipelineQueries {

  /** Winnowing fingerprints per document position: every 3-gram hashed
    * (md5 — same total order in DuckDB), then each w=4 sliding window's
    * MINIMUM kept. Any shared run of ≥ k+w-1 = 6 tokens between two docs
    * guarantees a shared fingerprint. Shared by q_fingerprint_winnow and
    * DedupSpec's guarantee test so the plan under test IS the production
    * plan. Returns (doc_id, pos, fp).
    */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .withColumn("tok1", lead("tok", 1).over(w))
      .withColumn("tok2", lead("tok", 2).over(w))
      .filter(col("tok2").isNotNull)
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", col("tok"), col("tok1"), col("tok2"))).as("gh"))
      .withColumn("fp", min("gh").over(w.rowsBetween(0, 3)))
      .select("doc_id", "pos", "fp")
  }

  // shared with EvalQueries: its oracle restates the classifier features
  private[pipeline] val stopwordsSql = stopwords.map(s => s"'$s'").mkString(", ")

  private val toksSql = graft.functions.TextFunctions.toksSql

  val defs: Seq[QueryDef] = Seq(

    // ----- Token counting + quality scoring -----
    QueryDef(
      "q_text_stats",
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents)
         |SELECT doc_id, lang,
         |       len(toks) AS n_tokens,
         |       len(list_distinct(toks)) AS n_unique_tokens,
         |       CAST(len(list_filter(toks, x -> x IN ($stopwordsSql))) AS DOUBLE) / NULLIF(len(toks), 0) AS stopword_ratio,
         |       CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / NULLIF(len(toks), 0) AS mean_token_len,
         |       CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / NULLIF(length(text), 0) AS punct_density
         |FROM t
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = tokens(col("text"))
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_unique_tokens"),
          stopwordRatio(t).as("stopword_ratio"),
          meanTokenLen(t).as("mean_token_len"),
          ((length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("double") /
            nullif(length(col("text")).cast("double"), lit(0.0))).as("punct_density"))
        .orderBy("doc_id")
    },

    // ----- Linear quality classifier (integer-exact logit) -----
    // The production pattern behind fastText/logistic quality filters
    // (CCNet, FineWeb-Edu): engineered features × trained weights →
    // threshold on the score. Re-expressed integer-exact so the decision
    // is bit-reproducible cross-engine AND across cluster sizes: features
    // are per-mille/×100 integer ratios (integer DIV — no float division
    // anywhere), weights are integers, the logit is a BIGINT dot product,
    // and keep = logit ≥ 0 (sigmoid is monotone, so thresholding the
    // probability IS thresholding the logit — the sigmoid itself never
    // needs evaluating). Swapping in trained weights changes constants,
    // not shape.
    //
    // Scale: a single codegen'd Project over the scan — zero shuffles,
    // zero joins; the classifier cost is one pass at wire speed, the
    // same map-only envelope as the PII scrub. The HOF filters iterate a
    // materialized token array (O(tokens), scalar lambda bodies) — not
    // the O(tokens²) tokenizer-in-lambda trap q_repetition_gopher's
    // comment documents.
    QueryDef(
      "q_quality_classifier",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
         |f AS (SELECT doc_id,
         |             CAST(len(toks) AS BIGINT) AS n_tokens,
         |             length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS sum_len,
         |             len(list_filter(toks, x -> x IN ($stopwordsSql))) AS n_stop,
         |             len(list_filter(toks, x -> len(x) >= 6)) AS n_long
         |      FROM t),
         |s AS (SELECT doc_id, n_tokens,
         |             CAST((n_stop * 1000) // n_tokens AS BIGINT) AS stop_pm,
         |             CAST((n_long * 1000) // n_tokens AS BIGINT) AS long_pm,
         |             CAST((sum_len * 100) // n_tokens AS BIGINT) AS meanlen_x100
         |      FROM f WHERE n_tokens > 0)
         |SELECT doc_id, n_tokens, stop_pm, long_pm, meanlen_x100,
         |       4*stop_pm + 2*long_pm + 6*n_tokens + meanlen_x100 - 1400 AS logit,
         |       4*stop_pm + 2*long_pm + 6*n_tokens + meanlen_x100 - 1400 >= 0 AS keep
         |FROM s
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = tokens(col("text"))
      val f = Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
            .cast("long").as("sum_len"),
          size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
            .cast("long").as("n_stop"),
          size(filter(toks, t => length(t) >= 6)).cast("long").as("n_long"))
        .filter(col("n_tokens") > 0)
        .select(
          col("doc_id"), col("n_tokens"),
          expr("(n_stop * 1000) DIV n_tokens").as("stop_pm"),
          expr("(n_long * 1000) DIV n_tokens").as("long_pm"),
          expr("(sum_len * 100) DIV n_tokens").as("meanlen_x100"))
      val logit = lit(4L) * col("stop_pm") + lit(2L) * col("long_pm") +
        lit(6L) * col("n_tokens") + col("meanlen_x100") - lit(1400L)
      f.select(col("doc_id"), col("n_tokens"), col("stop_pm"), col("long_pm"),
          col("meanlen_x100"), logit.as("logit"), (logit >= 0).as("keep"))
        .orderBy("doc_id")
    },

    // ----- BPE-ish token counting (GPT-2-style pretokenizer regex) -----
    // The regex uses only alternation + character classes (no lookaround),
    // so Java regex (Spark) and RE2 (DuckDB) produce identical leftmost
    // non-overlapping matches — which is what makes this oracle-able.
    QueryDef(
      "q_token_bpe",
      s"""SELECT doc_id,
         |       len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+')) AS n_bpe_tokens,
         |       len($toksSql) AS n_ws_tokens,
         |       CAST(length(text) AS DOUBLE) / NULLIF(len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+')), 0) AS chars_per_token
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bpePattern = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+"
      val bpe = regexp_extract_all(col("text"), lit(bpePattern), lit(0))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(bpe).as("n_bpe_tokens"),
          size(tokens(col("text"))).as("n_ws_tokens"),
          (length(col("text")).cast("double") /
            nullif(size(bpe).cast("double"), lit(0.0))).as("chars_per_token"))
        .orderBy("doc_id")
    },

    // ----- Exact dedup: hash-groupBy on content digest -----
    QueryDef(
      "q_dedup_exact",
      """SELECT source,
        |       COUNT(*) AS n_docs,
        |       COUNT(DISTINCT md5(text)) AS n_distinct_texts,
        |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"))
        .orderBy("source")
    },

    // ----- Order-insensitive bag fingerprint (rolling-copy detection) -----
    QueryDef(
      "q_fingerprint",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         |       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
         |       len(list_distinct(toks)) AS n_unique_tokens
         |FROM t
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = tokens(col("text"))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          bagFingerprint(t).as("fingerprint"),
          size(array_distinct(t)).as("n_unique_tokens"))
        .orderBy("doc_id")
    },

    // ----- Deterministic train/val/test split (hash buckets) -----
    // Splits MUST be reproducible across runs, machines, and engines —
    // rand() is none of those. Bucket = first two hex chars of
    // md5(doc_id): < 'cc' (204/256 ≈ 80%) train, < 'e6' (230/256 ≈ 90%)
    // val, else test. Pure map-side; the same row lands in the same split
    // forever, and adding documents never reshuffles existing ones.
    QueryDef(
      "q_split_stratified",
      """WITH h AS (
        |  SELECT lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hx
        |  FROM documents)
        |SELECT lang,
        |       CASE WHEN hx < 'cc' THEN 'train'
        |            WHEN hx < 'e6' THEN 'val' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs
        |FROM h GROUP BY 1, 2
        |ORDER BY lang, split""".stripMargin) { (s, d) =>
      val hx = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      Tables.documents(s, d)
        .select(col("lang"), hx.as("hx"))
        .withColumn("split",
          when(col("hx") < "cc", "train").when(col("hx") < "e6", "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")
    },

    // ----- Stratified deterministic sample: N docs per language -----
    // Order within each stratum by content-independent hash → an unbiased,
    // reproducible per-group sample (window top-N, no rand(), no collect).
    QueryDef(
      "q_sample_stratified",
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20
        |ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },

    // ----- Corpus length-distribution quantiles (per language) -----
    // The stats length/quality filter thresholds are derived from. EXACT
    // interpolated percentiles (Spark `percentile` = DuckDB quantile_cont:
    // both compute (1-d)*a + d*b on doubles over small ints → bit-equal,
    // hash-gateable); the streaming/sketch variant would be
    // approx_percentile, recall-checked against this baseline.
    QueryDef(
      "q_token_quantiles",
      s"""WITH t AS (SELECT lang, len($toksSql) AS n_tokens FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
         |       quantile_cont(n_tokens, 0.5) AS p50,
         |       quantile_cont(n_tokens, 0.9) AS p90,
         |       quantile_cont(n_tokens, 0.99) AS p99,
         |       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
         |FROM t GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), size(tokens(col("text"))).as("n_tokens"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n_tokens")).cast("long").as("min_tokens"),
          expr("percentile(n_tokens, 0.5)").as("p50"),
          expr("percentile(n_tokens, 0.9)").as("p90"),
          expr("percentile(n_tokens, 0.99)").as("p99"),
          max(col("n_tokens")).cast("long").as("max_tokens"))
        .orderBy("lang")
    },

    // ----- Winnowing fingerprints (rolling k-gram window minima) -----
    // The document-fingerprinting scheme behind copy-detection systems:
    // hash every 3-gram, slide a w=4 window over the hash sequence, keep
    // each window's minimum — any shared run of ≥ k+w-1 tokens between two
    // docs is guaranteed to share a fingerprint. The "hash" is the md5 hex
    // string (same total order in Spark and DuckDB → oracle-able); window
    // minima via ROWS BETWEEN, no interpreted lambdas anywhere.
    QueryDef(
      "q_fingerprint_winnow",
      """WITH raw AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |tok AS (
        |  SELECT * FROM (
        |    SELECT doc_id, unnest(toks) AS tok,
        |           unnest(generate_series(1, len(toks))) AS pos
        |    FROM raw)
        |  WHERE len(tok) > 0),
        |gram AS (
        |  SELECT doc_id, pos,
        |         md5(tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w) AS gh
        |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY LEAD(tok, 2) OVER w IS NOT NULL),
        |mins AS (
        |  SELECT doc_id,
        |         MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
        |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM gram)
        |SELECT doc_id,
        |       COUNT(DISTINCT fp) AS n_fingerprints,
        |       MIN(fp) AS min_fp, MAX(fp) AS max_fp
        |FROM mins GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      winnowFingerprints(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(
          countDistinct(col("fp")).as("n_fingerprints"),
          min(col("fp")).as("min_fp"),
          max(col("fp")).as("max_fp"))
        .orderBy("doc_id")
    },

    // ----- Language-ID heuristic vs. labeled language -----
    QueryDef(
      "q_langid",
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
         |p AS (
         |  SELECT lang,
         |         len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS en_hits,
         |         len(list_filter(toks, x -> x IN ('el','la','de','y'))) AS es_hits,
         |         len(list_filter(toks, x -> x IN ('der','die','das','und'))) AS de_hits,
         |         len(list_filter(toks, x -> x IN ('le','la','de','et'))) AS fr_hits
         |  FROM t)
         |SELECT lang,
         |       CASE WHEN es_hits > en_hits AND es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |            WHEN de_hits > en_hits AND de_hits >= fr_hits THEN 'de'
         |            WHEN fr_hits > en_hits THEN 'fr'
         |            ELSE 'en' END AS predicted_lang,
         |       COUNT(*) AS n_docs
         |FROM p
         |GROUP BY 1, 2
         |ORDER BY lang, predicted_lang""".stripMargin) { (s, d) =>
      langIdBreakdown(Tables.documents(s, d))
    },

    // ----- PII scan + redaction over free text -----
    // The corpus-cleaning step every web-scale pipeline runs before
    // training (C4/Dolma-style): count and redact emails and phone
    // numbers inside unstructured text. The synthetic corpus carries no
    // PII, so both engines INJECT identical deterministic PII into every
    // third document (derived from doc_id) before scanning — the operator
    // under test is the regex scan/redact machinery, and docs without
    // injected PII prove the no-op path leaves text untouched.
    //
    // Scale: map-only expression evaluation (regexp_extract_all +
    // regexp_replace, codegen'd), zero shuffles before the final sort.
    // Regexes are lookaround-free so Java and RE2 semantics agree.
    QueryDef(
      "q_pii_scrub",
      """WITH aug AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
        |                   || '@example.com or +1-555-'
        |                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE text END AS text
        |  FROM documents),
        |scanned AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(text, '[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]+')) AS n_emails,
        |         len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |         regexp_replace(
        |           regexp_replace(text, '[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g'),
        |           '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked
        |  FROM aug)
        |SELECT doc_id, n_emails, n_phones,
        |       substr(masked, GREATEST(length(masked) - 59, 1)) AS masked_tail,
        |       length(masked) AS masked_len
        |FROM scanned
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]+"
      val phoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
      val masked =
        regexp_replace(
          regexp_replace(col("text"), lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>"))
      Tables.documents(s, d)
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
              lit("@example.com or +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(col("text")))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
          masked.as("masked"))
        .select(
          col("doc_id"), col("n_emails"), col("n_phones"),
          substr(col("masked"), greatest(length(col("masked")) - 59, lit(1)), lit(60))
            .as("masked_tail"),
          length(col("masked")).cast("long").as("masked_len"))
        .orderBy("doc_id")
    },

    // ----- Unicode NFC normalization (UAX #15) -----
    // The native [[org.apache.spark.sql.graft.NfcNormalize]] expression
    // gated byte-for-byte against DuckDB's nfc_normalize (utf8proc): every
    // customer name gets a canonically-DECOMPOSED accent injected (e +
    // U+0301 combining acute — the form copy/paste and some OSes produce),
    // normalization recomposes it to the precomposed é. The multiset
    // checksum (order-independent SUM of per-row md5 prefixes over the
    // normalized UTF-8 bytes) gates the exact output strings, not just
    // their lengths. Map-only expression work, zero shuffles before the
    // 1-row aggregate. The combining char is a Scala literal on the Spark
    // side (Spark's chr() wraps codepoints at 256) and chr(769) in DuckDB.
    QueryDef(
      "q_unicode_nfc",
      """WITH raw AS (
        |  SELECT c_custkey, REPLACE(c_name, 'e', 'e' || chr(769)) AS dec FROM customer),
        |n AS (SELECT c_custkey, dec, nfc_normalize(dec) AS nfc FROM raw)
        |SELECT COUNT(*) AS n_names,
        |       CAST(SUM(LENGTH(dec)) AS BIGINT) AS sum_len_decomposed,
        |       CAST(SUM(LENGTH(nfc)) AS BIGINT) AS sum_len_nfc,
        |       COUNT(CASE WHEN nfc <> dec THEN 1 END) AS n_composed,
        |       CAST(SUM(CAST(('0x' || SUBSTR(MD5(nfc), 1, 8)) AS BIGINT)) AS BIGINT) AS nfc_checksum
        |FROM n""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graft.UnicodeFunctions.nfcNormalize
      Tables.customer(s, d)
        .select(regexp_replace(col("c_name"), "e", "é").as("dec"))
        .withColumn("nfc", nfcNormalize(col("dec")))
        .withColumn("h8",
          org.apache.spark.sql.graft.SketchExpressions.md5Hi64(col("nfc")))
        .agg(
          count(lit(1)).as("n_names"),
          sum(length(col("dec"))).cast("long").as("sum_len_decomposed"),
          sum(length(col("nfc"))).cast("long").as("sum_len_nfc"),
          count(when(col("nfc") =!= col("dec"), 1)).as("n_composed"),
          sum(expr("shiftrightunsigned(h8, 32)")).cast("long").as("nfc_checksum"))
    }
  )

  /** Language-ID confusion breakdown (labeled lang × predicted lang).
    * Same semantics as langIdHeuristic(tokens(text)), reshaped for the
    * engine: the HOF formulation evaluates 8 interpreted lambdas + 4
    * regex splits per document, while explode → codegen filter → one
    * hash aggregate tokenizes once and shuffles only marker hits (plus
    * one sentinel row per doc so marker-free docs survive to the agg).
    */
  def langIdBreakdown(docs: DataFrame): DataFrame = {
    val en = Seq("the", "a", "of", "and")
    val es = Seq("el", "la", "de", "y")
    val de = Seq("der", "die", "das", "und")
    val fr = Seq("le", "la", "de", "et")
    val markers = (en ++ es ++ de ++ fr).distinct
    def hits(m: Seq[String]) =
      sum(when(col("tok").isin(m: _*), 1).otherwise(0))
    val predicted =
      when(col("es_hits") > col("en_hits") &&
        col("es_hits") >= col("de_hits") && col("es_hits") >= col("fr_hits"), "es")
        .when(col("de_hits") > col("en_hits") && col("de_hits") >= col("fr_hits"), "de")
        .when(col("fr_hits") > col("en_hits"), "fr")
        .otherwise("en")
    docs
      .select(col("doc_id"), col("lang"),
        // coalesce: a NULL text must not drop the doc at explode — the
        // sentinel row alone survives, classifying it 'en' like the oracle
        explode(concat(array(lit(null).cast("string")),
          coalesce(tokens(col("text")), array().cast("array<string>")))).as("tok"))
      .filter(col("tok").isNull || col("tok").isin(markers: _*))
      .groupBy("doc_id", "lang")
      .agg(hits(en).as("en_hits"), hits(es).as("es_hits"),
        hits(de).as("de_hits"), hits(fr).as("fr_hits"))
      .select(col("lang"), predicted.as("predicted_lang"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted_lang")
  }
}
