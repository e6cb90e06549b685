package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Snowflake-semantics function shims (SURVEY.md §2.10, §2.12, §7.4).
  *
  * All are pure column expressions — they stay inside whole-stage codegen and
  * never fall back to a UDF, so they cost the same as built-ins at 100 TB.
  */
object SnowflakeFunctions {

  /** Snowflake `DATEDIFF(year, a, b)` = `year(b) - year(a)` (calendar-year
    * difference, NOT elapsed years). Ref: sql/2.verify_snapshot.sql:191-195,
    * sql/4.analytics_queries.sql:354-357.
    */
  def sfDateDiffYears(a: Column, b: Column): Column = year(b) - year(a)

  /** Snowflake `TIMESTAMPDIFF(MINUTE, a, b)` — counts minute-boundary
    * crossings (truncate both operands to the minute, then diff), matching
    * Snowflake/DuckDB DATEDIFF semantics exactly even with fractional seconds.
    * Ref: sql/4.analytics_queries.sql:53-55,87.
    */
  def sfTimestampDiffMinutes(a: Column, b: Column): Column =
    ((unix_timestamp(date_trunc("minute", b)) -
      unix_timestamp(date_trunc("minute", a))) / 60).cast("long")

  /** Snowflake `DAYOFWEEK`: 0=Sunday..6=Saturday; Spark `dayofweek` is
    * 1=Sunday..7. Ref: sql/4.analytics_queries.sql:137-138.
    */
  def sfDayOfWeek(c: Column): Column = dayofweek(c) - 1

  /** Snowflake `DAYNAME` → 3-letter day name. */
  def sfDayName(c: Column): Column = date_format(c, "EEE")

  /** Translate a Snowflake/PostgreSQL TO_CHAR pattern to a java.time pattern
    * understood by `date_format`. Covers the dialect used by the reference:
    * HH24, MI, SS, YYYY, MM, DD, MON. Ref: sql/4.analytics_queries.sql:37,54,125,252.
    */
  def translateToCharPattern(p: String): String = p
    .replace("HH24", "HH")
    .replace("MI", "mm")
    .replace("SS", "ss")
    .replace("YYYY", "yyyy")
    .replace("DD", "dd")
    .replace("MON", "MMM")

  /** Snowflake `TO_CHAR(ts, pattern)`. */
  def sfToChar(c: Column, sfPattern: String): Column =
    date_format(c, translateToCharPattern(sfPattern))

  /** `LISTAGG(DISTINCT x, sep) WITHIN GROUP (ORDER BY x)` — distinct, ordered,
    * separator-joined. Composition of codegen'd built-ins; exact WITHIN GROUP
    * semantics hold because the sort key equals the aggregated value.
    * Ref: sql/4.analytics_queries.sql:37.
    */
  def listaggDistinctOrdered(c: Column, sep: String): Column =
    array_join(array_sort(collect_set(c)), sep)

  /** `x * 100.0 / NULLIF(total, 0)` — the reference's ratio-with-guard idiom.
    * Ref: sql/4.analytics_queries.sql:117-118,159-160.
    */
  def pctOf(x: Column, total: Column): Column =
    x * lit(100.0) / nullif(total.cast("double"), lit(0.0))

  /** Exact-money helper: cast a double column to DECIMAL(18,2) so sums are
    * exact and associative — a double sum is order-dependent across Spark's
    * partial aggregation, which breaks bit-reproducibility between runs (and
    * versus any oracle). All money aggregates in the engine go through this.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Deterministic average: exact decimal sum → double, divided by the count.
    * One IEEE division of exact operands — bit-reproducible at any
    * parallelism, unlike avg(double).
    */
  def exactAvg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** `ROUND(AVG(money), 2)` with HALF_UP applied to the EXACT decimal
    * quotient, surfaced as DOUBLE. The division and the ROUND both stay in
    * DECIMAL: rounding the quotient as a DOUBLE sees the binary value
    * (261.885 is stored as 261.88499…) and rounds half-cent quotients DOWN,
    * while decimal HALF_UP rounds them UP. Equals the integer-cents identity
    * `(2·cents + n) div (2n) / 100` for non-negative money — the form the
    * DuckDB oracles use so no engine-version ROUND semantics are involved.
    * All money averages in the engine (and the semantic layer's `avg_money`)
    * go through this.
    */
  def moneyAvg2(c: Column): Column =
    round(sum(dec2(c)) / count(c), 2).cast("double")
}
