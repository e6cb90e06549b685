package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** End-to-end CDC ingestion (reference EP1):
  * snapshot load → ordered change-event stream → per-batch latest-wins merge
  * with soft delete + journal, on a 60 s micro-batch cadence
  * (/root/reference sql/3.live_appointments.sql:21-22,48-49).
  *
  * The stream side is Structured Streaming over a `Dataset[CdcEvent]`-shaped
  * source; `foreachBatch` gives the merge transactional per-batch semantics
  * with checkpoint-based restart (each batch id is applied exactly once per
  * checkpoint, and the merge itself is idempotent via the per-row lsn
  * high-water mark, so retries converge).
  */
final class CdcPipeline(
    spark: SparkSession,
    dest: CdcDestination,
    schemas: Map[String, StructType], // destination DATA schema per table (incl. key)
    keyCols: Map[String, String],
    clock: () => Column = () => current_timestamp()) {

  /** Destination schemas as currently known. A mid-stream source
    * `ALTER TABLE ADD COLUMN` shows up as after-images carrying a key the
    * declared schema lacks; the pipeline auto-widens — the reference's
    * connector owns the destination schema the same way
    * (sql/1.snowflake_setup.sql:47-49). New columns arrive as nullable
    * STRING (the after-image wire type); [[CdcApplier.applyBatch]] appends
    * them to the destination, so pre-evolution rows read NULL. Dropped or
    * renamed source columns never remove destination columns — absent keys
    * just cast to NULL, which is the lossless choice for a warehouse.
    */
  @volatile private var curSchemas: Map[String, StructType] = schemas

  def currentSchema(table: String): StructType = curSchemas(table)

  /** Initial snapshot (reference S2): auto-creates destination tables with
    * metadata columns, like the connector's snapshot phase.
    */
  def loadSnapshot(sources: Map[String, DataFrame]): Unit =
    sources.foreach { case (table, df) =>
      dest.commitSnapshot(table, CdcApplier.snapshot(df, clock()), keyCols(table))
    }

  /** Apply one micro-batch of raw events (all tables mixed, commit order by
    * lsn) to every affected destination table + journals. Public so batch
    * tests and the streaming path share one code path.
    */
  def applyEventBatch(events: Dataset[CdcEvent]): Unit = {
    val raw = events.toDF()
    raw.cache()
    try {
      val tables = raw.select("table").distinct().collect().map(_.getString(0))
      tables.foreach { t =>
        val keyCol = keyCols(t)
        val tEvents = raw.filter(col("table") === t)
        dest.appendJournal(t, tEvents.withColumn("after", to_json(col("after"))))
        // schema evolution probe — shared with CdcRecovery.rebuild so live
        // apply and disaster recovery can never diverge
        val declared = curSchemas(t)
        val schema = CdcApplier.widen(declared,
          CdcApplier.discoverNewColumns(tEvents, declared))
        curSchemas += t -> schema
        val typed = tEvents.select(
          Seq(col("op"), col("lsn"), col("commitTs"), col("key")) ++
            CdcApplier.afterImageColumns(schema, keyCol): _*)
        dest.mergeBatch(t, typed, keyCol, clock())
      }
    } finally raw.unpersist()
  }

  /** Start the streaming apply loop from an event-feed stream. */
  def start(eventStream: Dataset[CdcEvent], checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    import spark.implicits._
    eventStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CdcEvent], _: Long) =>
        applyEventBatch(batch)
      }
      .start()
  }
}

object CdcPipeline {
  /** File-based ordered event feed as a stream (the zero-egress stand-in for
    * Debezium/Kafka, per SURVEY §2.1 S1): JSON lines with the CdcEvent
    * envelope, read incrementally per file.
    */
  def fileEventStream(spark: SparkSession, dir: String): Dataset[CdcEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[CdcEvent].schema)
      .json(dir)
      .as[CdcEvent]
  }
}
