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

    // The carried right columns travel as ONE struct per right row, so
    // last(ignoreNulls=true) picks whole rows: a NULL field inside the most
    // recent right row stays NULL (it can't be backfilled from an older right
    // row), and "no prior right row" is a NULL struct — all fields NULL.
    val carryStruct = struct(rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val carryType = right.select(carryStruct.as("_c")).schema.head.dataType

    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(carryType).as("_carry"): _*)
    val rTagged = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) :+
        carryStruct.as("_carry"): _*)

    // right rows sort BEFORE left rows at equal ts → backward join is
    // inclusive (rightTs == leftTs matches), like DuckDB/Pandas ASOF
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastCarry = last(col("_carry"), ignoreNulls = true).over(w)

    lTagged.unionByName(rTagged)
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        carried.map(c => lastCarry.getField(c).as(c)): _*)
      .filter(col("_side") === 1)
      .drop("_ts", "_side")
  }
}
