package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed prefix aggregates over a TOTAL order — running sums
  * and per-group ranks — without a single-partition global window.
  *
  * `SUM(x) OVER (ORDER BY k)` / `ROW_NUMBER() OVER (ORDER BY k)` move the
  * whole input into ONE window partition (WindowExec warns and funnels
  * every row through one task), and `OVER (PARTITION BY g ORDER BY k)`
  * only helps while a single group fits one task — at 100 TB a
  * per-cluster rank with k=8 clusters is the same funnel 8 ways. The
  * classic scalable shape is the two-level prefix sum:
  *
  *   1. range-partition on the order keys (each partition owns a
  *      contiguous key range, so the global order is partition-major);
  *   2. per-partition subtotals — ONE ROW per partition, a frame bounded
  *      by the partition count (cluster configuration), not the data;
  *   3. exclusive prefix over that tiny frame (the only unpartitioned
  *      window, ≤ numPartitions rows) broadcast back;
  *   4. within-partition running aggregate + broadcast offset = the exact
  *      global value.
  *
  * Determinism: RangePartitioner samples the key distribution once PER
  * PHYSICAL EXCHANGE (at execution, not planning), and the subtotal
  * branch and the output branch both key on the partition id — so both
  * MUST observe ONE set of cuts. Exchange reuse (ReusedExchange) is an
  * optimizer courtesy, not a contract, and it audibly breaks on served
  * plans: column pruning pushes branch-specific projections below the
  * two exchange copies, the canonicalized subtrees stop matching, and
  * each branch gets its own independently-sampled cuts — correct only
  * while upstream shuffle-read order happens to repeat. The ranged
  * frame is therefore CHECKPOINTED (eager, [[Checkpoints]] flavor)
  * right after the Pid projection: the partition id becomes literal
  * data read by both branches, consistent by construction under any
  * optimizer behavior, stage retry, or shuffle-read reorder. The
  * checkpoint doubles as the usual multi-consumer materialization (the
  * frame is consumed twice), and the served-plan audits
  * (PrefixRankSpec, SelectionSpec) pin that no re-ranging exchange
  * survives in consumer plans. Boundaries themselves do not affect the
  * OUTPUT — offsets reconstruct the same global prefix wherever the
  * cuts land.
  *
  * Both entry points require `orderCols` to be a total order (include a
  * unique tiebreak column — every caller here appends an id); equal keys
  * land in one range partition, so ties cannot straddle an offset cut.
  */
object PrefixRank {

  private val Pid = "_prefix_pid"

  private def ranged(df: DataFrame, orderCols: Seq[Column], partitions: Int) =
    Checkpoints.stable(
      df.repartitionByRange(partitions, orderCols: _*)
        .withColumn(Pid, spark_partition_id()))

  /** `cumCol` = inclusive running total of `valueCol` over the total order
    * `orderCols` (ascending interpretation is the caller's: pass `.desc`
    * columns for a descending order). Adds `cumCol`, preserves all input
    * columns.
    */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      cumCol: String, partitions: Int): DataFrame = {
    val r = ranged(df, orderCols, partitions)
    val sub = r.groupBy(Pid).agg(sum(valueCol).as("_ps"))
    // the ONLY unpartitioned window: ≤ `partitions` rows by construction
    val exPrefix = Window.orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sub
      .withColumn("_off", coalesce(sum("_ps").over(exPrefix), lit(0L)))
      .select(Pid, "_off")
    val inner = Window.partitionBy(Pid).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.join(broadcast(offsets), Pid)
      .withColumn(cumCol, sum(valueCol).over(inner) + col("_off"))
      .drop(Pid, "_off")
  }

  /** `rankCol` = 1-based rank of each row WITHIN its `groupCols` group
    * under the total order `orderCols` (dense ROW_NUMBER semantics; pass a
    * unique tiebreak). Range-partitioning is group-major (group columns
    * lead the range key), so a group's rows are contiguous across
    * partitions and the per-(partition, group) counts — ≤ partitions ×
    * |groups| rows — reconstruct the exact global rank.
    */
  def withGroupRank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      rankCol: String, partitions: Int): DataFrame = {
    val keys = groupCols.map(col) ++ orderCols
    val r = ranged(df, keys, partitions)
    val sub = r.groupBy(Pid, groupCols: _*).agg(count(lit(1)).as("_pc"))
    // per-group exclusive prefix over the tiny counts frame: partitioned
    // by group, ordered by partition id
    val exPrefix = Window.partitionBy(groupCols.map(col): _*).orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sub
      .withColumn("_off", coalesce(sum("_pc").over(exPrefix), lit(0L)))
      .drop("_pc")
    val inner = Window.partitionBy((Pid +: groupCols).map(col): _*).orderBy(orderCols: _*)
    r.join(broadcast(offsets), Pid +: groupCols)
      .withColumn(rankCol, row_number().over(inner).cast("long") + col("_off"))
      .drop(Pid, "_off")
  }
}
