package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope CDC source adapter — the connector-boundary face of
  * [[CdcPipeline]] (r11 verdict item 1).
  *
  * The reference's pipeline starts at a logical-replication connector
  * (/root/reference sql/1.snowflake_setup.sql:73-91 configures the
  * publication; sql/3.live_appointments.sql:21-22 relies on its 60 s sync).
  * The wire format such connectors emit is the PUBLIC Debezium change-event
  * envelope (one JSON document per row change):
  *
  * {{{
  * {"payload": {
  *    "before": {...} | null,          // row image before (DELETE: ≥ the PK)
  *    "after":  {...} | null,          // row image after  (null on DELETE)
  *    "source": {"connector":"postgresql","table":"appointments",
  *               "lsn":12345,"ts_ms":1736899200000,...},
  *    "op": "c" | "u" | "d" | "r",     // create/update/delete/snapshot-read
  *    "ts_ms": 1736899200123}}
  * }}}
  *
  * [[parse]] turns a DataFrame of such JSON strings (a Kafka `value` column,
  * a file feed, anything) into the engine's `Dataset[CdcEvent]`, purely with
  * Catalyst expressions — `from_json` against a fixed envelope schema, no
  * UDFs, so parsing stays inside whole-stage codegen and scales like any
  * projection. Both envelope flavors are accepted: schema-wrapped
  * (`{"schema":…,"payload":{…}}`) and bare-payload
  * (`value.converter.schemas.enable=false`), by coalescing the two paths.
  *
  * Row images are decoded as `MAP<STRING,STRING>`: Spark's JSON parser
  * renders scalar values of any JSON type to their string form, which is
  * exactly the after-image wire contract [[CdcApplier]] casts against the
  * destination schema — and it makes the adapter schema-evolution-proof (a
  * source ALTER TABLE ADD COLUMN just shows up as a new map key; the
  * pipeline's widening probe does the rest).
  *
  * [[encode]] is the inverse (CdcEvent → envelope JSON via `to_json`), used
  * by fixtures and specs to stand in for the connector in this zero-egress
  * environment — and to prove `parse ∘ encode = id` as a property.
  */
object DebeziumSource {

  /** Fields of one change event we consume; unknown fields are ignored by
    * `from_json`, so real connectors' extra metadata (txId, sequence,
    * schema blocks) parses cleanly.
    */
  private val payloadSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(
      StructField("table", StringType),
      StructField("lsn", LongType),
      StructField("ts_ms", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Both envelope flavors at once: top-level payload fields AND a nested
    * `payload` struct; [[parse]] coalesces whichever is present.
    */
  private val envelopeSchema: StructType =
    payloadSchema.add(StructField("payload", payloadSchema))

  /** Per-table PK column name as a map literal (small: one entry per
    * replicated table — broadcast-free, folded into codegen).
    */
  private def keyColMap(keyCols: Map[String, String]) =
    map(keyCols.toSeq.flatMap { case (t, k) => Seq(lit(t), lit(k)) }: _*)

  /** Decode a DataFrame with a `value: STRING` column of Debezium change
    * events into the engine's event feed. Malformed lines and events for
    * tables outside `keyCols` (the "publication") are dropped — a connector
    * only ships the published tables; a parser that throws mid-stream on a
    * stray heartbeat line would be operationally wrong.
    *
    * Op mapping: `c` (create) and `r` (snapshot read) → INSERT, `u` →
    * UPDATE, `d` → DELETE. DELETEs carry no after-image; the key comes from
    * `before` (Postgres default REPLICA IDENTITY ships the PK there).
    */
  def parse(raw: DataFrame, keyCols: Map[String, String]): Dataset[CdcEvent] =
    events(decoded(raw, keyCols))

  /** The event-path tail over a [[decoded]] frame: keep decodable,
    * published, keyed, lsn-carrying lines and shape them as CdcEvents.
    */
  private def events(dec: DataFrame): Dataset[CdcEvent] = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec
      .filter(col("op").isNotNull && col("table").isNotNull &&
        col("keyCol").isNotNull && col("lsn").isNotNull && col("key").isNotNull)
      .select(
        col("table"),
        col("op"),
        col("lsn"),
        timestamp_millis(col("ts_ms")).as("commitTs"),
        col("key"),
        when(col("op") === CdcOp.Delete,
          map().cast(MapType(StringType, StringType)))
          // the wire after-image carries the PK (Debezium always ships the
          // full row); CdcEvent keeps the key out-of-band, so strip it —
          // keeping parse ∘ encode = id and the applier's image canonical
          .otherwise(map_filter(col("after"), (k, _) => k =!= col("keyCol")))
          .as("after"))
      .as[CdcEvent]
  }

  /** [[parse]] plus a dead-letter queue: the same decode, but every line
    * the event path would silently drop is ROUTED instead — (raw value,
    * reason) — because at production volume "dropped" must be observable
    * and replayable, not an inference from count deltas. Reasons are
    * checked in drop-cause order: `malformed` (no decodable op — parse
    * failures, heartbeats, empty lines, unsupported ops), `missing_table`
    * (a decodable op with no `source.table` — envelope damage, not a
    * heartbeat), `unpublished_table` (a table outside the publication map —
    * benign if the publication is a strict subset, an alert if it isn't),
    * `missing_lsn`, `missing_key` (key column absent from both row images),
    * `unparseable_key` (key column present but not castable to the numeric
    * PK — distinct from absent, because replay triage differs). Both
    * returned frames are
    * complementary filters over ONE shared decoded plan — each is still a
    * single codegen'd pass over the feed when materialized, so a caller
    * sinking BOTH (the normal deployment) pays two decodes of the batch
    * unless it persists the shared frame first; in `foreachBatch` that is
    * one `batch.persist()` before the split, and the conservation law
    * (every line lands in exactly one side) holds either way.
    *
    * Intentionally only an OPERATIONAL face: heartbeats arrive at a steady
    * rate by design, so a deployment sinks the DLQ with a journal-style
    * append and alerts on reason-mix change, not volume.
    */
  def parseWithDlq(raw: DataFrame, keyCols: Map[String, String])
      : (Dataset[CdcEvent], DataFrame) = {
    val dec = decoded(raw, keyCols)
    val dlq = dec
      .withColumn("reason",
        when(col("op").isNull, "malformed")
          .when(col("table").isNull, "missing_table")
          .when(col("keyCol").isNull, "unpublished_table")
          .when(col("lsn").isNull, "missing_lsn")
          .when(col("keyRaw").isNull, "missing_key")
          .when(col("key").isNull, "unparseable_key"))
      .filter(col("reason").isNotNull)
      .select(col("value"), col("reason"))
    (events(dec), dlq)
  }

  /** Shared decode: envelope JSON → op/images/table/lsn/ts plus the
    * per-table key column and the resolved key. Keeps [[parse]] and the
    * DLQ split reading ONE `from_json` of each line.
    */
  private def decoded(raw: DataFrame, keyCols: Map[String, String]): DataFrame = {
    val env = raw
      .select(col("value"), from_json(col("value"), envelopeSchema).as("e"))
      .select(col("value"),
        coalesce(col("e.payload.op"), col("e.op")).as("dop"),
        coalesce(col("e.payload.before"), col("e.before")).as("before"),
        coalesce(col("e.payload.after"), col("e.after")).as("after"),
        coalesce(col("e.payload.source.table"), col("e.source.table")).as("table"),
        coalesce(col("e.payload.source.lsn"), col("e.source.lsn")).as("lsn"),
        coalesce(col("e.payload.source.ts_ms"), col("e.source.ts_ms"),
          col("e.payload.ts_ms"), col("e.ts_ms")).as("ts_ms"))
    env
      .withColumn("op",
        when(col("dop").isin("c", "r"), CdcOp.Insert)
          .when(col("dop") === "u", CdcOp.Update)
          .when(col("dop") === "d", CdcOp.Delete))
      .withColumn("keyCol", element_at(keyColMap(keyCols), col("table")))
      // keyRaw (pre-cast) vs key (cast) stay separate so the DLQ can tell
      // "key column absent" from "key present but not a number"
      .withColumn("keyRaw",
        element_at(coalesce(col("after"), col("before")), col("keyCol")))
      // try_cast, not cast: under ANSI a corrupt non-numeric key must land
      // in the DLQ as unparseable_key, not throw mid-stream
      .withColumn("key", expr("try_cast(keyRaw AS LONG)"))
  }

  /** Streaming file feed of Debezium JSON lines (the stand-in for a Kafka
    * topic in this environment): `readStream.text` → [[parse]]. Plugs
    * straight into [[CdcPipeline.start]] as a second source face next to
    * [[CdcPipeline.fileEventStream]].
    */
  def fileStream(spark: SparkSession, dir: String,
      keyCols: Map[String, String]): Dataset[CdcEvent] =
    parse(spark.readStream.text(dir), keyCols)

  /** CdcEvent → Debezium envelope JSON (`value: STRING`), the connector
    * simulator: INSERT → op `c` with `after`, UPDATE → `u` with `after`,
    * DELETE → `d` with `after=null` and a PK-only `before` (default
    * REPLICA IDENTITY). Schema-wrapped flavor, like a stock connector with
    * schemas enabled.
    */
  def encode(events: Dataset[CdcEvent], keyCols: Map[String, String]): DataFrame = {
    val e = events.toDF()
      .withColumn("keyCol", element_at(keyColMap(keyCols), col("table")))
    val payload = struct(
      when(col("op") === CdcOp.Delete,
        map(col("keyCol"), col("key").cast("string"))).as("before"),
      // a real connector's after-image always includes the PK — re-embed
      // the out-of-band key so the wire format is faithful Debezium
      when(col("op") =!= CdcOp.Delete,
        map_concat(map(col("keyCol"), col("key").cast("string")),
          map_filter(col("after"), (k, _) => k =!= col("keyCol"))))
        .as("after"),
      struct(
        lit("postgresql").as("connector"),
        col("table").as("table"),
        col("lsn").as("lsn"),
        unix_millis(col("commitTs")).as("ts_ms")).as("source"),
      when(col("op") === CdcOp.Insert, "c")
        .when(col("op") === CdcOp.Update, "u")
        .otherwise("d").as("op"),
      unix_millis(col("commitTs")).as("ts_ms"))
    e.select(to_json(struct(payload.as("payload"))).as("value"))
  }
}
