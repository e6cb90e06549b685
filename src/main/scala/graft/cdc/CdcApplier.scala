package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The micro-batch merge kernel: applies one batch of CDC events to a
  * destination table with latest-wins-per-key semantics, soft deletes, and
  * metadata stamping — the observable behavior of the reference's connector
  * (/root/reference sql/2.verify_snapshot.sql:40-49,
  * sql/3.live_appointments.sql:412-414, sql/4.analytics_queries.sql:383-400).
  *
  * Scale design:
  *  - The only wide shuffle is the per-key latest-event window, keyed on the
  *    primary key — identical to what any MERGE would need. AQE handles skew.
  *  - The merge itself is a single full-outer join destination ⋈ batch-delta
  *    on the PK. Batch deltas are usually tiny relative to the table, so
  *    Spark broadcast-joins them against the destination scan.
  *  - Idempotent under retry: re-applying a batch yields the same state
  *    (guarded by the `lsn` high-water-mark column).
  */
object CdcApplier {

  val MetaInserted = "_snowflake_inserted_at"
  val MetaUpdated = "_snowflake_updated_at"
  val MetaDeleted = "_snowflake_deleted"
  val MetaLsn = "_cdc_lsn" // high-water mark per row, for idempotent retry

  /** Columns the applier owns; everything else comes from the row image. */
  val metaColumns: Seq[String] = Seq(MetaInserted, MetaUpdated, MetaDeleted, MetaLsn)

  /** Initial snapshot load (reference S2): stamp inserted_at, updated_at NULL
    * until first CDC update, deleted false, lsn 0.
    */
  def snapshot(source: DataFrame, loadTs: Column): DataFrame =
    source
      .withColumn(MetaInserted, loadTs.cast("timestamp_ntz"))
      .withColumn(MetaUpdated, lit(null).cast("timestamp_ntz"))
      .withColumn(MetaDeleted, lit(false))
      .withColumn(MetaLsn, lit(0L))

  /** Reduce a batch of events for ONE table to one delta row per key:
    * the latest event decides op/lsn, while the data columns come from the
    * latest NON-DELETE image in the batch (if any). Keeping the last image
    * separate from the tombstone is what makes the merge convergent under
    * arbitrary batch splits: INSERT→UPDATE→DELETE collapsed into one batch
    * leaves the same (image, deleted, updated) state as applying the three
    * events across three batches. `_ev_count` counts the key's events (used
    * for the updated_at stamping rule) and `_has_image` marks whether a
    * non-delete image exists in the batch.
    *
    * `events` columns: op, lsn, commitTs, key + after-image data columns.
    */
  /** Every non-data column [[latestPerKey]] emits ("key" included — the
    * caller renames it "_ev_key"). applyBatch derives the event DATA columns
    * by filtering on THIS set, so adding a helper column to latestPerKey
    * cannot silently read as a new source column and get widened into every
    * destination table.
    */
  val latestPerKeyHelperCols: Set[String] =
    Set("key", "op", "lsn", "commitTs", "_ev_count", "_has_image")

  def latestPerKey(events: DataFrame): DataFrame = {
    val dataCols = events.columns.filterNot(Seq("op", "lsn", "commitTs", "key").contains)
    val w = Window.partitionBy("key").orderBy(col("lsn").desc)
    val wAll = Window.partitionBy("key")
    val lastEvent = events
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ev_count", count(lit(1)).over(wAll))
      .filter(col("_rn") === 1)
      .select(Seq(col("key"), col("op"), col("lsn"), col("commitTs"), col("_ev_count")): _*)
    val lastImage = events.filter(col("op") =!= CdcOp.Delete)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("key").as("_img_key") +: dataCols.map(col): _*)
    lastEvent
      .join(lastImage, lastEvent("key") === col("_img_key"), "left")
      .withColumn("_has_image", col("_img_key").isNotNull)
      .drop("_img_key")
  }

  /** Merge one table's batch into its destination table.
    *
    * Schema evolution (reference: the connector auto-creates/widens the
    * destination schema — sql/1.snowflake_setup.sql:47-49): event data
    * columns the destination lacks are APPENDED to the output as nullable
    * columns — rows the batch doesn't touch (and pure-delete keys) read
    * NULL, exactly what `ALTER TABLE ADD COLUMN` gives pre-existing rows.
    * Destination columns absent from the events keep their current values,
    * so a narrower replayed feed can never drop data.
    *
    * @param dest     current destination state (data cols + meta cols)
    * @param events   this batch's events for the table: op, lsn, commitTs,
    *                 key, after-image data columns (null for DELETE)
    * @param keyCol   primary key column name in the destination
    * @param applyTs  the batch's processing timestamp (injectable clock —
    *                 SURVEY §7.4.3)
    */
  def applyBatch(dest: DataFrame, events: DataFrame, keyCol: String, applyTs: Column): DataFrame = {
    val destData = dest.columns.filterNot(metaColumns.contains).filterNot(_ == keyCol)
    val latest = latestPerKey(events)
      // idempotent retry: ignore events at-or-below the row's high-water mark
      .withColumnRenamed("key", "_ev_key")
    val evData = latest.columns
      .filterNot(c => c == "_ev_key" || latestPerKeyHelperCols.contains(c))
    val destSet = destData.toSet
    val evSet = evData.toSet
    val dataCols = destData ++ evData.filterNot(destSet) // new columns appended

    val joined = dest.join(latest, dest(keyCol) === latest("_ev_key"), "full_outer")

    val hasEvent = col("_ev_key").isNotNull && (col(MetaLsn).isNull || col("lsn") > col(MetaLsn))
    val isDelete = hasEvent && col("op") === CdcOp.Delete
    val isUpsert = hasEvent && col("op") =!= CdcOp.Delete
    val existed = dest(keyCol).isNotNull

    val mergedKey = coalesce(dest(keyCol), col("_ev_key")).as(keyCol)
    // data: any non-delete image in the batch wins (even under a trailing
    // DELETE — split-invariance); a pure-delete batch keeps the prior image
    val mergedData = dataCols.map { c =>
      val destC = if (destSet(c)) dest(c) else lit(null).cast(latest.schema(c).dataType)
      val evC = if (evSet(c)) latest(c) else destC
      when(hasEvent && col("_has_image"), evC).otherwise(destC).as(c)
    }
    // updated_at stamps when a CDC change touches a PRE-EXISTING row, or when
    // a new key saw more than one event in the batch (its split-applied
    // equivalent would have stamped on the second event)
    val stampsUpdate = hasEvent && (existed || col("_ev_count") > 1)
    val mergedMeta = Seq(
      // inserted_at: keep original; stamp on first appearance via CDC insert
      when(existed, dest(MetaInserted)).otherwise(applyTs.cast("timestamp_ntz")).as(MetaInserted),
      when(stampsUpdate, applyTs.cast("timestamp_ntz"))
        .otherwise(dest(MetaUpdated)).as(MetaUpdated),
      // soft delete: flag, never drop the row (reference S4)
      when(isDelete, lit(true))
        .when(isUpsert, lit(false))
        .otherwise(coalesce(dest(MetaDeleted), lit(false))).as(MetaDeleted),
      when(hasEvent, col("lsn")).otherwise(coalesce(dest(MetaLsn), lit(0L))).as(MetaLsn))

    joined.select(mergedKey +: (mergedData ++ mergedMeta): _*)
  }

  /** Cast a stringly-typed after-image map onto a destination schema,
    * producing one column per destination data column. CHECK-style validation
    * (e.g. the 7-state appointment status machine) happens here.
    */
  def afterImageColumns(schema: StructType, keyCol: String): Seq[Column] =
    schema.fields.filterNot(f => f.name == keyCol || metaColumns.contains(f.name)).map { f =>
      element_at(col("after"), f.name).cast(f.dataType).as(f.name)
    }.toSeq

  /** After-image keys absent from `schema` — the witness of a source
    * `ALTER TABLE ADD COLUMN` — ordered by (first-appearance lsn, name).
    * The SAME discovery drives the live pipeline and disaster rebuild
    * (one definition, so apply and recovery can never diverge), and the
    * lsn ordering makes the rebuilt column order equal the live one even
    * when evolution spanned many batches. Bounded collect: distinct after
    * keys ≤ the source table's column count, never row data.
    *
    * @param events rows with `after: map<string,string>` and `lsn`
    */
  def discoverNewColumns(events: DataFrame, schema: StructType): Seq[String] = {
    val known = schema.fieldNames.toSet
    events
      .select(explode(map_keys(col("after"))).as("c"), col("lsn"))
      .groupBy("c").agg(min("lsn").as("first_lsn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filterNot { case (c, _) => known(c) }
      .sortBy { case (c, l) => (l, c) }
      .map(_._1).toSeq
  }

  /** Append `newCols` to `schema` as nullable STRING (the after-image wire
    * type) — what `ALTER TABLE ADD COLUMN` gives pre-existing rows.
    */
  def widen(schema: StructType, newCols: Seq[String]): StructType =
    if (newCols.isEmpty) schema
    else StructType(schema.fields ++ newCols.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType, nullable = true)))
}
