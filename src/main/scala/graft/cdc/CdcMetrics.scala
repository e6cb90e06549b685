package graft.cdc

import org.apache.spark.sql.streaming.StreamingQuery

/** Observability for the CDC loop: per-micro-batch input volume and apply
  * latency, summarized from Structured Streaming's own progress reports.
  * The reference's operating target is a 60 s sync cadence
  * (/root/reference sql/3.live_appointments.sql:21-22,48-49); a batch whose
  * apply latency exceeds the trigger budget means the pipeline is falling
  * behind the source — the one number a CDC operator pages on.
  */
object CdcMetrics {

  final case class BatchSummary(
      batchId: Long,
      inputRows: Long,
      applyMillis: Long)

  /** One summary per reported micro-batch (empty until the first batch). */
  def summarize(q: StreamingQuery): Seq[BatchSummary] =
    q.recentProgress.toSeq.map { p =>
      BatchSummary(
        p.batchId,
        p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    }

  /** True iff at least one batch has reported AND every observed batch
    * applied within the trigger budget — the reference's "syncs every
    * minute" SLA as a checkable predicate. "No data yet" is NOT healthy
    * (it would page green while the stream is stuck before its first
    * batch), so it returns false. Observation window = Spark's
    * `recentProgress` ring buffer (~last 100 batches); a monitoring loop
    * must sample at least that often to see every batch.
    */
  def withinCadence(q: StreamingQuery, budgetMillis: Long): Boolean = {
    val s = summarize(q)
    s.nonEmpty && s.forall(_.applyMillis <= budgetMillis)
  }
}
