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
}
