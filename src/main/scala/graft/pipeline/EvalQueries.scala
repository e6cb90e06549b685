package graft.pipeline

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators for the training-data pipeline: once a cheap
  * learned filter (q_quality_classifier's linear logit) runs next to an
  * expensive rule gate (q_repetition_gopher's Gopher rules), the pipeline
  * needs to MEASURE how well the cheap score predicts the expensive label —
  * ranking quality (AUC) and probability calibration (reliability table).
  * That distill-then-evaluate loop is how production corpora replace
  * rule cascades with classifiers (and the measurement below is the honest
  * kind: on this synthetic corpus the logit ANTI-predicts the repetition
  * rule, AUC ≈ 0.24 — longer docs score higher on the quality envelope AND
  * repeat more — exactly the finding that would send a real pipeline back
  * to reweight features).
  *
  * Scale design: AUC is NOT computed by ranking all rows (a global sort at
  * 100 TB). Scores are quantized into fixed-width bins (width 100 on an
  * integer logit spanning a few thousand) and AUC comes from the binned
  * histogram via the Mann-Whitney identity with midpoint tie-credit:
  *   AUC·2PN = Σ_bins n_neg·(2·cum_pos_below + n_pos)
  * The per-bin rollup is one map-side-combined aggregate over the doc
  * frame; the prefix-sum window runs over ≤ a few hundred BIN rows, never
  * the corpus. Same histogram feeds the calibration table (observed keep
  * rate per score bin) with no window at all. Everything is integer-exact.
  *
  * Both inputs are the REGISTERED faces composed by name — the score and
  * the label the gate already verified — so the eval cannot drift from
  * what it claims to evaluate.
  */
object EvalQueries {

  private def scored(s: SparkSession, d: String): DataFrame = {
    val logit = TextPipelineQueries.defs.find(_.name == "q_quality_classifier").get
      .build(s, d).select(col("doc_id"), col("logit"))
    val label = CorpusStatsQueries.defs.find(_.name == "q_repetition_gopher").get
      .build(s, d).select(col("doc_id"), when(col("keep"), 1L).otherwise(0L).as("y"))
    logit.join(label, "doc_id")
      .select(col("doc_id"), col("logit"), col("y"),
        expr("CAST(FLOOR(logit / 100.0) AS BIGINT)").as("bin"))
  }

  private val scoredSql: String =
    s"""t AS (SELECT doc_id, ${graft.functions.TextFunctions.toksSql} AS toks, text FROM documents),
       |f AS (SELECT doc_id,
       |             CAST(len(toks) AS BIGINT) AS n_tokens,
       |             length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS sum_len,
       |             len(list_filter(toks, x -> x IN (${TextPipelineQueries.stopwordsSql}))) AS n_stop,
       |             len(list_filter(toks, x -> len(x) >= 6)) AS n_long
       |      FROM t),
       |sc AS (SELECT doc_id,
       |             4*CAST((n_stop*1000)//n_tokens AS BIGINT)
       |             + 2*CAST((n_long*1000)//n_tokens AS BIGINT)
       |             + 6*n_tokens + CAST((sum_len*100)//n_tokens AS BIGINT) - 1400 AS logit
       |      FROM f WHERE n_tokens > 0),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |tokc AS (SELECT doc_id, MAX(c) AS max_tok, CAST(SUM(c) AS BIGINT) AS n_tokens
       |         FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2) GROUP BY 1),
       |g2 AS (SELECT doc_id, a || ' ' || b AS g
       |       FROM (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS a,
       |                    unnest(toks[2:len(toks)]) AS b FROM t)),
       |g2c AS (SELECT doc_id, MAX(c) AS max_g2, CAST(SUM(c) AS BIGINT) AS n_g2
       |        FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
       |g3 AS (SELECT doc_id, a || ' ' || b || ' ' || c3 AS g
       |       FROM (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS a,
       |                    unnest(toks[2:len(toks)-1]) AS b,
       |                    unnest(toks[3:len(toks)]) AS c3 FROM t)),
       |g3c AS (SELECT doc_id, COUNT(DISTINCT g) AS d3, COUNT(*) AS n3 FROM g3 GROUP BY 1),
       |lab AS (SELECT tokc.doc_id,
       |               CASE WHEN CAST(max_tok AS DOUBLE)/tokc.n_tokens <= 0.11
       |                     AND COALESCE(CAST(max_g2 AS DOUBLE)/n_g2 <= 0.06, TRUE)
       |                     AND COALESCE(CAST(n3 - d3 AS DOUBLE)/n3 <= 0.2, TRUE)
       |                    THEN 1 ELSE 0 END AS y
       |        FROM tokc
       |        LEFT JOIN g2c ON tokc.doc_id = g2c.doc_id
       |        LEFT JOIN g3c ON tokc.doc_id = g3c.doc_id),
       |j AS (SELECT sc.doc_id, sc.logit, lab.y,
       |             CAST(FLOOR(sc.logit / 100.0) AS BIGINT) AS bin
       |      FROM sc JOIN lab ON sc.doc_id = lab.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_classifier_auc",
      s"""WITH $scoredSql,
         |bins AS (SELECT bin, CAST(SUM(y) AS BIGINT) AS n_pos,
         |                CAST(SUM(1-y) AS BIGINT) AS n_neg
         |         FROM j GROUP BY 1),
         |cum AS (SELECT bin, n_pos, n_neg,
         |               COALESCE(SUM(n_pos) OVER (ORDER BY bin
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_pos
         |        FROM bins)
         |SELECT CAST((SELECT SUM(n_pos) FROM bins) AS BIGINT) AS n_pos,
         |       CAST((SELECT SUM(n_neg) FROM bins) AS BIGINT) AS n_neg,
         |       CAST((SELECT COUNT(*) FROM bins) AS BIGINT) AS n_bins,
         |       CAST(SUM(n_neg * (2*cum_pos + n_pos)) AS BIGINT) AS auc2_num,
         |       CAST(SUM(n_neg * (2*cum_pos + n_pos)) * 1000
         |            // (2 * (SELECT SUM(n_pos) FROM bins) * (SELECT SUM(n_neg) FROM bins))
         |            AS BIGINT) AS auc_permille
         |FROM cum""".stripMargin) { (s, d) =>
      val bins = scored(s, d).groupBy("bin")
        .agg(sum("y").as("n_pos"), sum(expr("1 - y")).as("n_neg"))
      // prefix sum over ≤ a few hundred bin rows — the single-partition
      // window is over BIN cardinality (score range / 100), not the corpus
      val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
      val cum = bins.withColumn("cum_pos", coalesce(sum("n_pos").over(w), lit(0L)))
      cum.agg(
        sum("n_pos").as("n_pos"),
        sum("n_neg").as("n_neg"),
        count(lit(1)).as("n_bins"),
        sum(expr("n_neg * (2*cum_pos + n_pos)")).as("auc2_num"))
        .select(col("n_pos"), col("n_neg"), col("n_bins"), col("auc2_num"),
          expr("auc2_num * 1000 DIV (2 * n_pos * n_neg)").as("auc_permille"))
    },

    QueryDef(
      "q_score_calibration",
      s"""WITH $scoredSql
         |SELECT bin,
         |       bin * 100 AS bin_lo,
         |       COUNT(*) AS n,
         |       CAST(SUM(y) AS BIGINT) AS n_keep,
         |       CAST(SUM(y) * 1000 // COUNT(*) AS BIGINT) AS keep_permille
         |FROM j GROUP BY 1
         |ORDER BY bin""".stripMargin) { (s, d) =>
      scored(s, d).groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("n_keep"))
        .select(col("bin"), expr("bin * 100").as("bin_lo"), col("n"), col("n_keep"),
          expr("n_keep * 1000 DIV n").as("keep_permille"))
        .orderBy("bin")
    }
  )
}
