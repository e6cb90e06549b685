package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus/warehouse quality gates a production training-data pipeline runs
  * before (and between) the transform stages: declarative data-quality
  * expectations, exact deterministic stratified sampling, and a
  * compressibility-based quality signal.
  *
  * Reference context: the reference's pipeline trusts its source schema
  * (ref sql/0.init_healthcare.sql NOT NULL / PK constraints) and verifies
  * row counts post-snapshot (ref sql/2.verify_snapshot.sql); these operators
  * generalize that "assert the data is what the pipeline assumes" step to
  * arbitrary expectation sets, and add the sampling/quality signals an LLM
  * data pipeline needs that the reference's BI workload does not.
  */
object QualityGateQueries {

  /** Per-document deflate length (zlib level 6) + UTF-8 byte length.
    *
    * Compressibility is a standard corpus-quality signal (Gopher §A1.1-style
    * repetition filtering from the other direction): highly repetitive or
    * templated text compresses far below natural prose (~35%), while
    * already-compressed / random content stays near 100%.
    *
    * `mapPartitions` is justified here for codec lifecycle only (one
    * `Deflater` allocated and `end()`ed per partition, `reset()` between
    * rows — same rule as [[Multimodal]]'s codecs); everything downstream is
    * ordinary codegen'd aggregation. At 100 TB this is the ideal map-only
    * shape: no shuffle until the (tiny) per-source rollup.
    */
  def deflateLengths(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        val mapped = rows.map { case (id, src, text) =>
          val bytes =
            (if (text == null) "" else text).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var z = 0L
          while (!deflater.finished()) z += deflater.deflate(buf)
          (id, src, bytes.length.toLong, z)
        }
        new Iterator[(Long, String, Long, Long)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) deflater.end()
            h
          }
          def next(): (Long, String, Long, Long) = mapped.next()
        }
      }
      .toDF("doc_id", "source", "n_bytes", "z_len")
  }

  /** Exact deterministic stratified sample: N docs per `source` stratum,
    * ranked by a Knuth multiplicative hash of `doc_id` (order-free,
    * engine-portable integer arithmetic — the same rows come back on any
    * engine, any partitioning, any run).
    *
    * Scale shape: a bare `ROW_NUMBER() OVER (PARTITION BY source)` funnels
    * each stratum through ONE task — with few large strata that is the
    * classic window skew cliff. The pre-filter keeps only rows whose hash
    * falls in the smallest band expected to contain ~4N survivors
    * (threshold = 4N·2³²/stratum_count, counts broadcast), so the window
    * ranks ~4N rows per stratum instead of the whole corpus. The filter is
    * part of the operator's DEFINITION (the oracle applies the identical
    * band), so both engines agree bit-for-bit even in the (spec-asserted
    * absent) undershoot case.
    */
  def stratifiedSample(docs: DataFrame, perStratum: Int): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val band = lit(4L * perStratum * 4294967296L)
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    docs
      .join(broadcast(counts), "source")
      .withColumn("h", h)
      .filter(col("h") < (band / col("n")).cast("long"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perStratum)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy("source", "rk")
  }

  def defs: Seq[QueryDef] = Seq(

    // ----- Declarative data-quality expectations audit -----
    // One row per expectation: referential integrity, domain/range, key
    // uniqueness, non-emptiness — the checks a pipeline asserts before
    // training data leaves a stage. Each check is one scan + aggregate;
    // the FK check is a dimension join Catalyst broadcasts when the
    // dimension is small (and AQE re-plans when it is not). Nothing here
    // is quadratic or driver-side at any scale.
    QueryDef(
      "q_dq_expectations",
      """WITH fk AS (
        |  SELECT COUNT(*) AS total,
        |         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS viol
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |qty AS (
        |  SELECT COUNT(*) AS total,
        |         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS viol
        |  FROM lineitem),
        |pk AS (
        |  SELECT COUNT(*) AS total, COUNT(*) - COUNT(DISTINCT c_custkey) AS viol
        |  FROM customer),
        |txt AS (
        |  SELECT COUNT(*) AS total,
        |         CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS viol
        |  FROM documents),
        |ev AS (
        |  SELECT COUNT(*) AS total,
        |         CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS viol
        |  FROM events)
        |SELECT check_name, n_rows, n_violations,
        |       ROUND((n_rows - n_violations) * 100.0 / n_rows, 1) AS pass_pct
        |FROM (
        |  SELECT 'orders_custkey_fk' AS check_name, total AS n_rows, viol AS n_violations FROM fk
        |  UNION ALL SELECT 'lineitem_quantity_range', total, viol FROM qty
        |  UNION ALL SELECT 'customer_pk_unique', total, viol FROM pk
        |  UNION ALL SELECT 'documents_text_nonempty', total, viol FROM txt
        |  UNION ALL SELECT 'events_value_nonnegative', total, viol FROM ev)
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      def check(name: String, df: DataFrame, violation: org.apache.spark.sql.Column): DataFrame =
        df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(violation, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
      val fkJoined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "left")
      val pk = Tables.customer(s, d).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("n_violations"))
        .select(lit("customer_pk_unique").as("check_name"), col("n_rows"), col("n_violations"))
      check("orders_custkey_fk", fkJoined, col("c_custkey").isNull)
        .unionAll(check("lineitem_quantity_range", Tables.lineitem(s, d),
          col("l_quantity") < 1 || col("l_quantity") > 50))
        .unionAll(pk)
        .unionAll(check("documents_text_nonempty", Tables.documents(s, d),
          col("text").isNull || length(col("text")) === 0))
        .unionAll(check("events_value_nonnegative", Tables.events(s, d),
          col("value").isNull || col("value") < 0))
        .withColumn("pass_pct",
          round((col("n_rows") - col("n_violations")) * lit(100.0) / col("n_rows"), 1))
        .orderBy("check_name")
    },

    // ----- Exact deterministic stratified sample (10 per source) -----
    // (Strata in the testdata are 25 docs at sf0.01 / 250 at sf0.1 per
    // source; N=10 exercises both the keep-everything small-stratum path
    // and the real pre-filter path at sf0.1, where the band keeps ~40 of
    // 250 before the window ranks them.)
    QueryDef(
      "q_sample_per_source",
      """WITH cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |pre AS (
        |  SELECT d.doc_id, d.source,
        |         (d.doc_id * 2654435761) % 4294967296 AS h
        |  FROM documents d JOIN cnt ON d.source = cnt.source
        |  WHERE (d.doc_id * 2654435761) % 4294967296 < (171798691840 // cnt.n)),
        |rk AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        |  FROM pre)
        |SELECT source, rk, doc_id FROM rk WHERE rk <= 10
        |ORDER BY source, rk""".stripMargin) { (s, d) =>
      stratifiedSample(Tables.documents(s, d), perStratum = 10)
    },

    // ----- Per-group bottom-k-by-hash sampling (bounded aggregate face) -----
    // The SCALE face of per-group uniform sampling: bottom-k by a seeded
    // hash IS a uniform without-replacement sample (deterministic,
    // retry-safe, merge-order-invariant), and KMinAgg.kminBy keeps ≤ k
    // (hash, id) pairs in EVERY partial buffer — one shuffle whose
    // reduce-side state is k pairs per group, where the rank-window shape
    // (q_sample_per_source's pre-filtered variant) sorts group members.
    // The md5 hex chain makes the hash DuckDB-derivable, so the oracle
    // re-ranks per source and the gate hash-matches the exact sample.
    QueryDef(
      "q_sample_bottomk",
      """WITH h AS (SELECT source, doc_id,
        |                  CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
        |           FROM documents),
        |rk AS (SELECT source, doc_id, hv,
        |              ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS r
        |       FROM h)
        |SELECT source, r AS rank, doc_id, hv
        |FROM rk WHERE r <= 8
        |ORDER BY source, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graft.SketchExpressions
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          SketchExpressions.md5Hi64(concat(lit("smp:"), col("doc_id").cast("string"))).as("h8"))
        .select(col("source"), col("doc_id"), expr("shiftrightunsigned(h8, 16)").as("hv"))
        .filter(col("hv").isNotNull) // primitive-Long udaf input: skip nulls
        .groupBy("source")
        .agg(graft.functions.KMinAgg.kminBy(col("hv"), col("doc_id"), 8).as("mins"))
        .select(col("source"), posexplode(col("mins")).as(Seq("p", "m")))
        .select(col("source"), (col("p") + 1).cast("long").as("rank"),
          col("m.id").as("doc_id"), col("m.h").as("hv"))
        .orderBy("source", "rank")
    },

    // ----- Compressibility quality signal (zlib ratio per source) -----
    // Candidate stage (deflate lengths) is JVM-side and not DuckDB-
    // expressible, so it is materialized via OracleStage (same pattern as
    // the LSH candidate sets) and the exact integer/double aggregation is
    // re-verified cross-engine. corpus_ratio divides two EXACT integer
    // sums — one double division, no summation-order sensitivity; the
    // per-band counts compare integers cross-multiplied (z·100 < t·bytes),
    // never floats.
    QueryDef(
      "q_compress_ratio",
      s"""SELECT source, COUNT(*) AS n_docs,
         |       ROUND(SUM(z_len) * 1.0 / SUM(n_bytes), 9) AS corpus_ratio,
         |       CAST(SUM(CASE WHEN z_len * 100 < 35 * n_bytes THEN 1 ELSE 0 END) AS BIGINT) AS n_high_repeat,
         |       CAST(SUM(CASE WHEN z_len * 100 >= 90 * n_bytes THEN 1 ELSE 0 END) AS BIGINT) AS n_incompressible
         |FROM ${graft.OracleStage.pq("comp_ratio")}
         |GROUP BY source
         |ORDER BY source""".stripMargin) { (s, d) =>
      val staged = graft.OracleStage.stage("comp_ratio", deflateLengths(Tables.documents(s, d)))
      staged
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum(col("z_len")) * lit(1.0) / sum(col("n_bytes")), 9).as("corpus_ratio"),
          sum(when(col("z_len") * 100 < col("n_bytes") * 35, 1L).otherwise(0L)).as("n_high_repeat"),
          sum(when(col("z_len") * 100 >= col("n_bytes") * 90, 1L).otherwise(0L)).as("n_incompressible"))
        .orderBy("source")
    },

    // ----- Robust outlier detection: median absolute deviation -----
    // The DQ screen for numeric measures that mean/stddev z-scores get
    // wrong in the presence of the very outliers being hunted: flag
    // values where |v − median| > 3·MAD, per group. Both the median and
    // the MAD are EXACT interpolated percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont`, per the oracle parity rules), and every
    // float that reaches a decision is a short fixed-order IEEE chain
    // (subtract / abs / one multiply / compare) — no float summation, so
    // the counts gate exactly cross-engine.
    //
    // Scale: two grouped exact percentiles (one over values, one over
    // deviations) + a broadcast join of the 5-row medians table back onto
    // the stream. Exact percentile buffers each GROUP's values — right
    // for group counts ≪ corpus (here: event types); a high-cardinality
    // group key swaps in percentile_approx, which q_token_quantiles
    // already gates against its exact twin within 10%.
    QueryDef(
      "q_outlier_mad",
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |               ABS(e.value - m.med) AS ad
        |        FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT d.event_type, d.med AS median_value, md.mad,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CASE WHEN d.ad > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN md USING (event_type)
        |GROUP BY 1, 2, 3
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val m = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(m), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val md = dev.groupBy("event_type").agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(md), "event_type")
        .groupBy(col("event_type"), col("med").as("median_value"), col("mad"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("ad") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }
  )
}
