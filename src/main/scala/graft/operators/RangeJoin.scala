package graft.operators

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second custom join the reference
  * family of workloads needs beyond AS-OF ([[AsOfJoin]]): match every point
  * row to every interval row containing it, with NO equi-key.
  *
  * Naive plans for `ts BETWEEN start AND end` are nested loops: O(|P|·|I|)
  * comparisons, a broadcast-nested-loop when one side is small and a
  * cross-join disaster when neither is. The scale shape is BUCKET BLOCKING:
  *
  *  1. each interval is exploded to the fixed-width time buckets it
  *     overlaps (`sequence(bucket(start), bucket(end))` — interval length /
  *     bucket width rows each);
  *  2. each point maps to exactly ONE bucket;
  *  3. equi-join on the bucket id (plain shuffle/broadcast hash join);
  *  4. exact containment filter re-checks `start <= ts <= end`.
  *
  * Every candidate pair appears exactly once (the point's single bucket),
  * so no post-join dedup is needed. Work is O(|P| + |I|·w/b + |candidates|),
  * shuffle key = bucket id: the join scales with data volume and interval
  * width, never with |P|·|I|. Bucket width trades explode factor against
  * candidate selectivity — pick it near the typical interval width.
  */
object RangeJoin {

  /** Inner point-in-interval join on day buckets.
    *
    * @param points    frame with a timestamp column `tsCol`
    * @param intervals frame with TIMESTAMP `startCol`/`endCol`; containment
    *                  is `start <= ts <= end` with BOTH ends inclusive at
    *                  timestamp precision. A DATE-typed end compares as that
    *                  day's MIDNIGHT — callers wanting "through the whole
    *                  end day" must pass `end_date + INTERVAL 1 DAY - 1
    *                  second` (or an explicit timestamp). Intervals must
    *                  satisfy start <= end.
    */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val p = points.withColumn("_bucket", to_date(col(tsCol)))
    val i = intervals.withColumn("_bucket",
      explode(sequence(to_date(col(startCol)), to_date(col(endCol)))))
    p.join(i, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Every purchase event defines a 1-day attribution window; all events
    * (any user — NO shared key, the pure range-join case) falling in the
    * window are aggregated per purchase. The value sum goes through DECIMAL
    * on both sides (the established `value` parity rule) so summation order
    * can't flip the hash gate.
    */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_range_join_attr",
      """WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id,
        |       COUNT(e.event_id) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS window_value
        |FROM p JOIN events e
        |  ON e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 DAY
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("event_id").as("p_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("w_end"))
      val points = ev.select(col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("value"))
      pointInInterval(points, "ts", purchases, "w_start", "w_end")
        .groupBy(col("p_id").as("event_id"))
        .agg(
          count(lit(1)).as("n_events"), // inner join: = COUNT(e.event_id)
          sum(col("value")).cast("double").as("window_value"))
        .orderBy("event_id")
    })
}
