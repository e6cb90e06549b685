package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive rollups over a CDC-merged table —
  * the dashboard-at-scale operator: the reference recomputes its analytics
  * aggregates (daily revenue, status mixes, …) by full table scan on every
  * refresh (sql/4.analytics_queries.sql), which at 100 TB means rescanning
  * the world for a handful of changed rows every 60 s sync. This operator
  * maintains the aggregate from per-batch state CHANGELOGS instead: cost
  * per batch is O(touched keys + rollup size), independent of table size.
  *
  * Correct-by-construction design: the delta is derived from the SAME merge
  * kernel that maintains the table ([[graft.cdc.CdcApplier.applyBatch]]) —
  * the caller evaluates the batch's touched keys against the state before
  * and after the merge, and the delta is "after-contribution minus
  * before-contribution" of exactly those keys. Latest-wins collapsing, soft
  * deletes, idempotent-replay high-water marks all inherit from the kernel
  * rather than being re-implemented (and drifting) here.
  *
  * Measures must be ADDITIVE expressions (counts, sums — exact types: LONG
  * counts, integer-cents LONG money, DECIMAL sums) so increments commute
  * and the maintained rollup is bit-equal to a full recompute; derive
  * ratios/averages at read time from the additive parts. Floating-point
  * sums are NOT safe here (addition-order drift between the incremental
  * and recomputed paths); keep doubles at the output boundary.
  */
object IncrementalRollup {

  /** @param groupCols rollup grain
    * @param measures  (name, additive row expression) pairs; a `n` count
    *                  column is always maintained and gates group liveness
    */
  final case class Spec(groupCols: Seq[String], measures: Seq[(String, Column)])

  /** Full recompute of the rollup from a set of LIVE rows (the caller
    * applies the visibility filter) — the bootstrap aggregate and the
    * correctness reference for the incremental path.
    */
  def full(liveRows: DataFrame, spec: Spec): DataFrame =
    liveRows.groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        spec.measures.map { case (m, e) => sum(e).as(m) }: _*)

  private def negate(rollup: DataFrame, spec: Spec): DataFrame =
    rollup.select(spec.groupCols.map(col) ++
      (("n" +: spec.measures.map(_._1)).map(m => (-col(m)).as(m))): _*)

  /** Re-aggregate rollup-grain rows (sum `n` + every measure) — the ONE
    * definition of the maintained columns, shared by delta and merge so the
    * two paths cannot drift.
    */
  private def reAgg(rows: DataFrame, spec: Spec): DataFrame = {
    val sums = ("n" +: spec.measures.map(_._1)).map(m => sum(col(m)).as(m))
    rows.groupBy(spec.groupCols.map(col): _*).agg(sums.head, sums.tail: _*)
  }

  /** One batch's rollup delta: the touched keys' aggregate contribution
    * after the merge minus their contribution before it. Insert-only keys
    * have no before-rows, deleted keys no after-rows, updates both — all
    * three fall out of the same subtraction. `touchedKeys` is one column
    * named `keyCol` (typically `latestPerKey(events)`'s keys): the two
    * state scans are key-pruned to the batch, never full-table.
    */
  def batchDelta(stateBefore: DataFrame, stateAfter: DataFrame,
      touchedKeys: DataFrame, keyCol: String, liveFilter: Column,
      spec: Spec): DataFrame = {
    def contribution(state: DataFrame) =
      full(state.join(touchedKeys, Seq(keyCol), "left_semi").filter(liveFilter), spec)
    reAgg(contribution(stateAfter)
      .unionByName(negate(contribution(stateBefore), spec)), spec)
  }

  /** Fold a delta into the maintained rollup. Groups whose live count
    * reaches zero are dropped (a fully-deleted grain must vanish from the
    * dashboard, exactly as it would from a recompute). The merge is a
    * re-aggregation of rollup ∪ delta — both are rollup-grain-sized, so
    * this is O(rollup), not O(table).
    */
  def merge(rollup: DataFrame, delta: DataFrame, spec: Spec): DataFrame =
    reAgg(rollup.unionByName(delta), spec).filter(col("n") > 0)
}
