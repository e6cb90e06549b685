package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the most recent right row
  * with `rightTs <= leftTs` for the same key — the canonical time-series
  * alignment operator (trades→quotes, purchases→views) that Spark has no
  * built-in for (SURVEY §7.3 / prompt operator (a)-tier: compose existing
  * ops).
  *
  * Plan shape: tag-union both sides, ONE window over (key, ts) carrying the
  * last-seen right values forward (`last(..., ignoreNulls=true)`), then keep
  * the left rows. Cost = one shuffle on the key + a sort within partitions —
  * strictly cheaper than the range-join + per-row max subquery a naive
  * formulation needs, and it never materializes candidate pairs, so it
  * scales with |L|+|R| rather than the number of (left, right) combinations.
  */
object AsOfJoin {

  /** @param left      left rows (keep all)
    * @param right     right rows to align
    * @param key       equi-key column present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right columns to carry (renamed as given)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.values.toSeq

    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightCols.values.toSeq.map(c => lit(null).as(c)): _*)
    val rTagged = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)

    // right rows sort BEFORE left rows at equal ts → backward join is
    // inclusive (rightTs == leftTs matches), like DuckDB/Pandas ASOF
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols = carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c))

    lTagged.unionByName(rTagged)
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) ++ carriedCols: _*)
      .filter(col("_side") === 1)
      .drop("_ts", "_side")
  }
}
