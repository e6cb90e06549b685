package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bounded-memory quantile sketch over UNBOUNDED non-negative integer
  * domains (r13 verdict item 2): HDR-histogram-style exponent/mantissa
  * bucketing (Tene's HdrHistogram; the log-bucketed family of DDSketch,
  * Masson et al. 2019). The r13 histogram face requires a known [0, 512)
  * range; this face buckets ANY long ≥ 0 into at most [[NumBuckets]]
  * (= 1888) buckets with a PROVEN relative value error:
  *
  *  - v < 2^(S+1) (= 64): bucket id = v exactly (error 0 / width 1);
  *  - otherwise with e = ⌊log₂ v⌋: id = (e−S)·2^S + (v >> (e−S)) — the
  *    top S+1 mantissa bits; bucket width 2^(e−S), so width/lo ≤ 2^−S
  *    (3.125%) everywhere.
  *
  * The id is monotone in v, so per-group quantile readout is: cumulate
  * counts over ascending ids, pick the first bucket whose cumulative
  * count reaches ⌈q·n⌉ — that bucket CONTAINS the exact q-th order
  * statistic by construction (rank error 0; value error ≤ one bucket
  * width ≤ 2^−S relative). The sketch state is pure additive (bucket,
  * count) pairs: mergeable in any split/order (QuantileSketchSpec's
  * ScalaCheck law), map-side combinable, ≤ 1888 × 16 bytes per group.
  *
  * Integer-exact cross-engine: the exponent is derived from the BINARY
  * STRING length (`length(bin(v)) − 1`), not floating log2 — both Spark
  * and DuckDB produce identical bin() strings for any bigint, so the
  * oracle replays the bucketing bit for bit. Negative inputs clamp to
  * bucket 0 (the domain contract is non-negative measures: lengths,
  * latencies, prices).
  */
object QuantileSketch {

  /** Sub-bucket bits: 2^S sub-buckets per octave. */
  val S = 5
  private val SubBuckets = 1 << S // 32

  /** Max bucket id + 1 for 63-bit positive longs: ids [0, 64) exact +
    * (62−S) octaves × 32 sub-buckets, top id (62−S)·32 + 63.
    */
  val NumBuckets: Int = (62 - S) * SubBuckets + 2 * SubBuckets // 1888

  // variable-amount shifts (the DSL helpers only take Int literals)
  private def shr(v: Column, n: Column): Column = call_function("shiftright", v, n)
  private def shl(v: Column, n: Column): Column = call_function("shiftleft", v, n)

  /** Bucket id of a long column — monotone, integer-exact (see class doc). */
  def bucketOf(v0: Column): Column = {
    val v = v0.cast("long")
    val e = (length(bin(v)) - 1).cast("int") // ⌊log₂ v⌋ for v ≥ 1, exactly
    when(v <= 0, lit(0L))
      .when(v < 2 * SubBuckets, v)
      .otherwise(((e - S) * SubBuckets).cast("long") + shr(v, e - S))
  }

  /** Inclusive lower value bound of a bucket id. */
  def bucketLo(id0: Column): Column = {
    val id = id0.cast("long")
    val k = shr(id, lit(S)).cast("int") // id DIV 32: ids are non-negative
    when(id < 2 * SubBuckets, id)
      .otherwise(shl(id - (k - 1).cast("long") * SubBuckets, k - 1))
  }

  /** INCLUSIVE upper value bound of a bucket id (lo + width − 1).
    * Inclusive, not exclusive, so the top octave's bound is Long.MaxValue
    * exactly instead of 2^63 — an exclusive bound would overflow (and
    * throw under ANSI).
    */
  def bucketHi(id0: Column): Column = {
    val id = id0.cast("long")
    val k = shr(id, lit(S)).cast("int")
    // lo + (width − 1), NOT (lo + width) − 1: the latter transiently hits
    // 2^63 for the top octave and throws under ANSI
    when(id < 2 * SubBuckets, id)
      .otherwise(bucketLo(id) + (shl(lit(1L), k - 1) - 1))
  }

  /** The same bucket function for executor-side (streaming state) code —
    * QuantileSketchSpec proves it equal to [[bucketOf]] through the
    * executed plan over the full long range.
    */
  def bucketOfJvm(v: Long): Int =
    if (v <= 0) 0
    else if (v < 2 * SubBuckets) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - S) * SubBuckets + (v >> (e - S))).toInt
    }

  /** DuckDB rendering of [[bucketOf]] over a column expression `v`
    * (BIGINT) — the oracle-side mirror, shift via the `>>` operator.
    */
  def bucketSql(v: String): String =
    s"""CASE WHEN $v <= 0 THEN 0
       |     WHEN $v < ${2 * SubBuckets} THEN $v
       |     ELSE (length(bin($v)) - 1 - $S) * $SubBuckets
       |          + ($v >> (length(bin($v)) - 1 - $S)) END""".stripMargin

  /** DuckDB rendering of [[bucketLo]] over a bucket-id expression. */
  def loSql(id: String): String =
    s"""CASE WHEN $id < ${2 * SubBuckets} THEN $id
       |     ELSE ($id - ($id // $SubBuckets - 1) * $SubBuckets)
       |          << CAST($id // $SubBuckets - 1 AS INT) END""".stripMargin

  /** DuckDB rendering of [[bucketHi]] over a bucket-id expression. */
  def hiSql(id: String): String =
    s"""CASE WHEN $id < ${2 * SubBuckets} THEN $id
       |     ELSE (${loSql(id)})
       |          + ((1::BIGINT << CAST($id // $SubBuckets - 1 AS INT)) - 1) END""".stripMargin

  // ----- shared p50/p90/p99 readout (the one law, four call sites) -----

  /** DuckDB readout over a prior CTE named `qsv` with columns
    * ($grpCol, v BIGINT): bucket counts, cumulative selection at
    * ⌈q·n⌉, the exact discrete percentile via a rank window (the
    * VERIFICATION side — production reads only the bucket counts), the
    * bucket bounds, and the containment flag. Shared verbatim by
    * q_quantile_sketch and q_stream_quantile_sketch so the readout law
    * lives in exactly one place per engine.
    */
  def readoutSql(grpCol: String): String =
    s"""b AS (SELECT $grpCol, ${bucketSql("v")} AS id, COUNT(*) AS cnt
       |      FROM qsv GROUP BY 1, 2),
       |cum AS (SELECT $grpCol, id,
       |               SUM(cnt) OVER (PARTITION BY $grpCol ORDER BY id) AS c
       |        FROM b),
       |n AS (SELECT $grpCol, CAST(COUNT(*) AS BIGINT) AS n FROM qsv GROUP BY 1),
       |t AS (SELECT $grpCol, n, unnest([500, 900, 990]) AS qp,
       |             (n * unnest([500, 900, 990]) + 999) // 1000 AS kq
       |      FROM n),
       |sel AS (SELECT t.$grpCol, t.qp, t.n, t.kq, CAST(MIN(id) AS BIGINT) AS bucket
       |        FROM t JOIN cum ON cum.$grpCol = t.$grpCol AND cum.c >= t.kq
       |        GROUP BY 1, 2, 3, 4),
       |rk AS (SELECT $grpCol, v, ROW_NUMBER() OVER (PARTITION BY $grpCol ORDER BY v) AS r
       |       FROM qsv),
       |ex AS (SELECT s.$grpCol, s.qp, s.n, s.bucket, rk.v AS exact_v
       |       FROM sel s JOIN rk ON rk.$grpCol = s.$grpCol AND rk.r = s.kq),
       |bd AS (SELECT $grpCol, qp, n, exact_v,
       |              CAST(${loSql("bucket")} AS BIGINT) AS est_lo,
       |              CAST(${hiSql("bucket")} AS BIGINT) AS est_hi
       |       FROM ex)
       |SELECT $grpCol, CAST(qp AS BIGINT) AS q_permille, n, est_lo, est_hi, exact_v,
       |       CAST(CASE WHEN est_lo <= exact_v AND exact_v <= est_hi
       |                 THEN 1 ELSE 0 END AS BIGINT) AS within
       |FROM bd ORDER BY $grpCol, q_permille""".stripMargin

  /** Spark readout twin of [[readoutSql]]. Inputs are decomposed so the
    * streaming gate can feed counts/totals FROM ITS STATE FACE's cells
    * (proving the maintained counters drive the readout) while the batch
    * gate derives them from raw values:
    *   - `counts`: ($grpCol, id, cnt) — the sketch state;
    *   - `totals`: ($grpCol, n) — per-group row counts;
    *   - `values`: ($grpCol, v) — raw values, used ONLY for the exact
    *     verification rank window.
    */
  def readout(counts: org.apache.spark.sql.DataFrame,
      totals: org.apache.spark.sql.DataFrame,
      values: org.apache.spark.sql.DataFrame,
      grpCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = counts.withColumn("c",
      sum("cnt").over(Window.partitionBy(grpCol).orderBy("id")))
    val t = totals.select(col(grpCol), col("n"),
        explode(expr("array(500, 900, 990)")).as("qp"))
      .withColumn("kq", expr("(n * qp + 999) DIV 1000"))
    val sel = t.join(cum, Seq(grpCol)).filter(col("c") >= col("kq"))
      .groupBy(grpCol, "qp", "n", "kq").agg(min("id").cast("long").as("bucket"))
    val rk = values.withColumn("r",
        row_number().over(Window.partitionBy(grpCol).orderBy("v")))
      .select(col(grpCol).as("__g2"), col("v").as("exact_v"), col("r"))
    sel.join(rk, col(grpCol) === col("__g2") && col("r") === col("kq"))
      .select(col(grpCol), col("qp").cast("long").as("q_permille"), col("n"),
        bucketLo(col("bucket")).as("est_lo"),
        bucketHi(col("bucket")).as("est_hi"),
        col("exact_v"))
      .withColumn("within",
        when(col("est_lo") <= col("exact_v") && col("exact_v") <= col("est_hi"), 1L)
          .otherwise(0L))
      .orderBy(grpCol, "q_permille")
  }
}
