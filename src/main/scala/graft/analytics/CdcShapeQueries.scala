package graft.analytics

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC semantics exercised as oracle-checkable batch queries over the `events`
  * table (SURVEY.md §2.11 T2–T6). The streaming applier in [[graft.cdc]] uses
  * exactly the same latest-wins window inside `foreachBatch`; expressing it
  * here proves the core merge kernel against the DuckDB oracle.
  *
  * Scale: the latest-per-key window shuffles once on the key — the same
  * shuffle a MERGE would need — and AQE handles key skew. No driver-side
  * state; everything is a distributed plan.
  */
object CdcShapeQueries {

  /** SCD2 version frame shared by q_cdc_scd2 and q_cdc_scd2_asof: one row
    * per change event with [valid_from_sec, valid_to_sec) validity.
    * ROW_NUMBER and LEAD share the window spec → ONE Window operator over
    * ONE (user_id) exchange. Floor-epoch-second BIGINTs everywhere — the
    * parquet timestamps are ns-precision, Spark truncates to µs while
    * DuckDB keeps ns, so sub-second components must never reach an output
    * or an ORDER BY; (ts_sec, event_id) is a total order both engines
    * agree on exactly.
    */
  private def scd2Versions(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    Tables.events(s, d)
      .filter(col("user_id") <= 40)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("ts_sec"))
      .select(
        col("user_id"),
        row_number().over(w).cast("long").as("version_seq"),
        col("event_type").as("state"),
        col("ts_sec").as("valid_from_sec"),
        lead(col("ts_sec"), 1).over(w).as("valid_to_sec"),
        (lead(col("ts_sec"), 1).over(w).isNull && col("event_type") =!= "error")
          .as("is_current"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- T2/T3: latest-wins per key, ordered by (ts, event_id) -----
    // The exact kernel of the CDC applier: one row per key, highest
    // (commit_ts, lsn) wins. Ref: sql/3.live_appointments.sql:412 semantics.
    QueryDef(
      "q_cdc_latest_per_key",
      """SELECT user_id, event_type AS last_event_type,
        |       CAST(value AS DOUBLE) AS last_value,
        |       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND user_id <= 200
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("user_id") <= 200)
        .select(
          col("user_id"),
          col("event_type").as("last_event_type"),
          col("value").cast("double").as("last_value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .orderBy("user_id")
    },

    // ----- T4: soft-delete visible state -----
    // Treat a terminal 'error' event as a tombstone: the row survives with a
    // deleted flag, exactly like `_SNOWFLAKE_DELETED` (sql/4.analytics_queries.sql:400).
    QueryDef(
      "q_cdc_soft_delete_state",
      """WITH latest AS (
        |  SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT (event_type = 'error') AS is_deleted,
        |       COUNT(*) AS n_keys
        |FROM latest WHERE rn = 1
        |GROUP BY 1
        |ORDER BY is_deleted""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy((col("event_type") === "error").as("is_deleted"))
        .agg(count(lit(1)).as("n_keys"))
        .orderBy("is_deleted")
    },

    // ----- T5: journal analytics — change volume by hour × type -----
    // Shape of sql/4.analytics_queries.sql:420-430 (hourly change patterns).
    QueryDef(
      "q_cdc_journal_by_hour",
      """SELECT DATE_TRUNC('hour', ts) AS change_hour, event_type,
        |       COUNT(*) AS n_changes,
        |       COUNT(DISTINCT user_id) AS n_keys
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY change_hour, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-30 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("hour", col("ts")).as("change_hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_changes"),
          countDistinct(col("user_id")).as("n_keys"))
        .orderBy("change_hour", "event_type")
    },

    // ----- T6 shape: metadata-stamp style audit — first/last touch per key -----
    // Mirrors _SNOWFLAKE_INSERTED_AT / _SNOWFLAKE_UPDATED_AT invariants
    // (sql/2.verify_snapshot.sql:41-49): updated IS NULL until a second event.
    QueryDef(
      "q_cdc_audit_metadata",
      """WITH touches AS (
        |  SELECT user_id, MIN(ts) AS inserted_at,
        |         CASE WHEN COUNT(*) > 1 THEN MAX(ts) END AS updated_at,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY user_id
        |)
        |SELECT (updated_at IS NOT NULL) AS was_updated,
        |       COUNT(*) AS n_keys,
        |       MIN(n_events) AS min_events,
        |       MAX(n_events) AS max_events
        |FROM touches
        |GROUP BY 1
        |ORDER BY was_updated""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(col("ts")).as("inserted_at"),
          when(count(lit(1)) > 1, max(col("ts"))).as("updated_at"),
          count(lit(1)).as("n_events"))
        .groupBy(col("updated_at").isNotNull.as("was_updated"))
        .agg(
          count(lit(1)).as("n_keys"),
          min(col("n_events")).as("min_events"),
          max(col("n_events")).as("max_events"))
        .orderBy("was_updated")
    },

    // ----- SCD Type 2 dimension history from the change feed -----
    // The canonical downstream consumer of a CDC feed: every change event
    // becomes a version row with [valid_from, valid_to) validity and an
    // is_current flag; a terminal 'error' event acts as a tombstone (key
    // closed, no current version) — consistent with the soft-delete
    // semantics above. Ref: the reference's journal/_SNOWFLAKE_DELETED
    // model (sql/3.live_appointments.sql, sql/4.analytics_queries.sql:400)
    // is exactly SCD2 with history collapsed; here history is kept.
    //
    // All ordering and validity arithmetic is on floor-epoch-second BIGINTs:
    // the parquet timestamps are ns-precision, Spark truncates to µs while
    // DuckDB keeps ns, so sub-second components must never reach an output
    // or an ORDER BY. (ts_sec, event_id) is a total order both engines agree
    // on exactly.
    //
    // Scale: one hash exchange on the key; ROW_NUMBER and LEAD share the
    // same window spec so Catalyst evaluates both in a single Window
    // operator over a single sort. No driver state, no joins.
    QueryDef(
      "q_cdc_scd2",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id <= 40
        |)
        |SELECT user_id,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_seq,
        |       event_type AS state,
        |       ts_sec AS valid_from_sec,
        |       LEAD(ts_sec) OVER w AS valid_to_sec,
        |       (LEAD(ts_sec) OVER w IS NULL AND event_type <> 'error') AS is_current
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |ORDER BY user_id, version_seq""".stripMargin) { (s, d) =>
      scd2Versions(s, d).orderBy("user_id", "version_seq")
    },

    // ----- Point-in-time snapshot from the SCD2 history -----
    // The payoff of keeping validity intervals: reconstruct the table state
    // as of any instant T with a pure interval-containment filter — no
    // replay, no journal scan. A key whose version at T is the 'error'
    // tombstone was deleted at T and drops out. Same single-exchange plan
    // as q_cdc_scd2 plus a codegen'd filter.
    QueryDef(
      "q_cdc_scd2_asof",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id <= 40
        |), v AS (
        |  SELECT user_id, event_type AS state, ts_sec AS valid_from_sec,
        |         LEAD(ts_sec) OVER w AS valid_to_sec
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |)
        |SELECT user_id, state, valid_from_sec AS since_sec
        |FROM v
        |WHERE valid_from_sec <= 1705276800
        |  AND (valid_to_sec IS NULL OR valid_to_sec > 1705276800)
        |  AND state <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val asOf = 1705276800L // 2024-01-15 00:00:00 UTC
      scd2Versions(s, d)
        .filter(col("valid_from_sec") <= asOf &&
          (col("valid_to_sec").isNull || col("valid_to_sec") > asOf) &&
          col("state") =!= "error")
        .select(col("user_id"), col("state"), col("valid_from_sec").as("since_sec"))
        .orderBy("user_id")
    },

    // ----- Changelog compaction: net change per key per day -----
    // The journal-compaction primitive: collapse each key's events within a
    // retention window (here: calendar day) to first state, last state, and
    // change count — what a compacting CDC sink keeps when full history is
    // too expensive. Both ROW_NUMBERs partition by (user_id, day_num) and
    // the final aggregate groups by the same keys, so the whole query rides
    // ONE exchange (two sorts share it). Day boundaries via BIGINT floor
    // division of epoch seconds — identical in both engines.
    QueryDef(
      "q_cdc_compaction",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num
        |  FROM events WHERE user_id <= 40
        |), r AS (
        |  SELECT user_id, day_num, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, day_num
        |                            ORDER BY ts_sec, event_id) AS rn_first,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, day_num
        |                            ORDER BY ts_sec DESC, event_id DESC) AS rn_last
        |  FROM ev
        |)
        |SELECT user_id, day_num,
        |       MAX(CASE WHEN rn_first = 1 THEN event_type END) AS first_state,
        |       MAX(CASE WHEN rn_last = 1 THEN event_type END) AS last_state,
        |       COUNT(*) AS n_changes
        |FROM r GROUP BY user_id, day_num
        |ORDER BY user_id, day_num""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("user_id") <= 40)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
        .withColumn("day_num", expr("CAST(ts_sec DIV 86400 AS BIGINT)"))
      val wf = Window.partitionBy("user_id", "day_num").orderBy(col("ts_sec"), col("event_id"))
      val wl = Window.partitionBy("user_id", "day_num")
        .orderBy(col("ts_sec").desc, col("event_id").desc)
      ev
        .withColumn("rn_first", row_number().over(wf))
        .withColumn("rn_last", row_number().over(wl))
        .groupBy("user_id", "day_num")
        .agg(
          max(when(col("rn_first") === 1, col("event_type"))).as("first_state"),
          max(when(col("rn_last") === 1, col("event_type"))).as("last_state"),
          count(lit(1)).as("n_changes"))
        .orderBy("user_id", "day_num")
    },

    // ----- JSON props extraction (event envelope parsing) -----
    // The CDC event feed carries JSON payloads; extraction must stay a
    // codegen'd expression, not a UDF.
    QueryDef(
      "q_cdc_props_json",
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          min(k).as("min_k"),
          max(k).as("max_k"))
        .orderBy("event_type")
    },

    // ----- Consistent cut across unevenly-progressing CDC feeds -----
    // A multi-table sync never has its per-table feeds at the same point:
    // each source partition/table stream carries its own high-water mark,
    // and the only transactionally-consistent snapshot the destination can
    // expose is "everything at or below the SLOWEST feed's high-water
    // mark" — the min-of-max safe watermark (the same cut rule Flink's
    // aligned checkpoints and Debezium's snapshot chunk watermarking use).
    // Here the feed is multiplexed into 4 shards (user_id % 4 — disjoint
    // key spaces, like per-table streams); the query derives each shard's
    // high-water mark, cuts at the global minimum, reconstructs latest-wins
    // state at the cut, and reports per shard: the lag the cut imposes on
    // faster feeds, events applied, live keys, and tombstoned keys.
    //
    // Scale: the watermark is a 4-row aggregate broadcast back into the
    // scan filter (never a driver collect); the reconstruction is the same
    // single-exchange latest-wins window as q_cdc_latest_per_key; the
    // final per-shard rollups are map-side combined to 4 rows each.
    QueryDef(
      "q_cdc_consistent_cut",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
        |         CAST(user_id % 4 AS BIGINT) AS shard
        |  FROM events),
        |hwm AS (SELECT shard, MAX(ts_sec) AS hwm_sec FROM ev GROUP BY 1),
        |cut AS (SELECT MIN(hwm_sec) AS cut_sec FROM hwm),
        |upto AS (SELECT ev.* FROM ev CROSS JOIN cut WHERE ts_sec <= cut_sec),
        |latest AS (
        |  SELECT shard, event_type FROM (
        |    SELECT shard, event_type,
        |           ROW_NUMBER() OVER (PARTITION BY user_id
        |                              ORDER BY ts_sec DESC, event_id DESC) AS rn
        |    FROM upto) t WHERE rn = 1),
        |applied AS (SELECT shard, COUNT(*) AS n_events_applied FROM upto GROUP BY 1),
        |keys AS (SELECT shard, COUNT(*) AS n_keys,
        |                CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstoned
        |         FROM latest GROUP BY 1)
        |SELECT h.shard, h.hwm_sec, c.cut_sec,
        |       h.hwm_sec - c.cut_sec AS lag_sec,
        |       COALESCE(a.n_events_applied, 0) AS n_events_applied,
        |       COALESCE(k.n_keys, 0) AS n_keys,
        |       COALESCE(k.n_tombstoned, 0) AS n_tombstoned
        |FROM hwm h CROSS JOIN cut c
        |LEFT JOIN applied a ON a.shard = h.shard
        |LEFT JOIN keys k ON k.shard = h.shard
        |ORDER BY h.shard""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("ts_sec"),
        (col("user_id") % 4).cast("long").as("shard"))
      val hwm = ev.groupBy("shard").agg(max("ts_sec").as("hwm_sec"))
      val cut = hwm.agg(min("hwm_sec").as("cut_sec"))
      val upto = ev.crossJoin(broadcast(cut)).filter(col("ts_sec") <= col("cut_sec"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec").desc, col("event_id").desc)
      val latest = upto.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val applied = upto.groupBy("shard").agg(count(lit(1)).as("n_events_applied"))
      val keys = latest.groupBy("shard").agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_tombstoned"))
      // LEFT joins: a shard whose every event sits ABOVE the cut (a feed
      // that only started after the slowest feed's high-water mark) still
      // reports its row — with its lag and zero applied — instead of
      // silently vanishing from the ledger
      hwm.crossJoin(broadcast(cut))
        .join(applied, Seq("shard"), "left")
        .join(keys, Seq("shard"), "left")
        .select(col("shard"), col("hwm_sec"), col("cut_sec"),
          (col("hwm_sec") - col("cut_sec")).as("lag_sec"),
          coalesce(col("n_events_applied"), lit(0L)).as("n_events_applied"),
          coalesce(col("n_keys"), lit(0L)).as("n_keys"),
          coalesce(col("n_tombstoned"), lit(0L)).as("n_tombstoned"))
        .orderBy("shard")
    },

    // ----- Chunked bootstrap under a live stream (DBLog reconciliation) --
    // A 100 TB table cannot be snapshotted in one read while its change
    // stream flows; the public answer (Netflix DBLog, 2019; Debezium's
    // incremental snapshot) reads the key space in CHUNKS, each at its own
    // stream position, and reconciles: a chunk row is authoritative only
    // until the stream produces a later event for that key — then the
    // stream wins. Modeled exactly: the bootstrap is evaluated at feed
    // position P (Jan 30); chunk = key % 8, chunk i's snapshot watermark
    // w_i = Jan 28 + 6i hours (chunks read sequentially while the feed
    // advances), chunk row = latest-wins state at w_i, stream = events in
    // (w_i, P]. Final state per key = latest stream event if one exists,
    // else the chunk row — both paths genuinely taken at every sf (keys
    // quiet since their chunk read finalize from the snapshot; hot keys
    // get overridden). The output carries the per-chunk
    // reconciliation ledger AND the proof obligation: n_state_matches
    // (chunked-bootstrap state == direct latest-wins truth, by event id)
    // must equal n_keys on every row — the gate hash-matches that claim
    // cross-engine instead of trusting this comment.
    //
    // Scale: chunk id and watermark are map-only expressions of the key
    // (no chunk table, no join to assign them). The three per-key heads
    // (truth / chunk row / stream head) are CONDITIONAL ARGMAXES in one
    // per-key aggregate: the latest-wins order (ts_sec, event_id) packs
    // into one BIGINT (ts_sec·2³¹ + event_id — exact while event ids stay
    // below 2³¹ and epoch seconds below ~2³², both asserted by the pack
    // staying positive), so MAX(CASE WHEN side THEN packed END) picks each
    // side's head with map-side combine — ONE key exchange, no windows, no
    // joins; the ledger is a second map-side-combined 8-row rollup.
    QueryDef(
      "q_cdc_chunked_bootstrap",
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
        |         CAST(user_id % 8 AS BIGINT) AS chunk,
        |         1706400000 + CAST(user_id % 8 AS BIGINT) * 21600 AS w_sec
        |  FROM events
        |  WHERE CAST(FLOOR(EPOCH(ts)) AS BIGINT) <= 1706572800),
        |heads AS (
        |  SELECT chunk, w_sec, user_id,
        |         MAX(ts_sec * 2147483648 + event_id) AS truth_k,
        |         MAX(CASE WHEN ts_sec <= w_sec THEN ts_sec * 2147483648 + event_id END) AS snap_k,
        |         MAX(CASE WHEN ts_sec > w_sec THEN ts_sec * 2147483648 + event_id END) AS stream_k
        |  FROM ev GROUP BY chunk, w_sec, user_id)
        |SELECT chunk, w_sec,
        |       COUNT(*) AS n_keys,
        |       CAST(SUM(CASE WHEN snap_k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_snapshot_rows,
        |       CAST(SUM(CASE WHEN stream_k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_final_from_stream,
        |       CAST(SUM(CASE WHEN stream_k IS NULL AND snap_k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_final_from_snapshot,
        |       CAST(SUM(CASE WHEN COALESCE(stream_k, snap_k) = truth_k THEN 1 ELSE 0 END) AS BIGINT) AS n_state_matches
        |FROM heads
        |GROUP BY chunk, w_sec
        |ORDER BY chunk""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_sec"),
        (col("user_id") % 8).cast("long").as("chunk"),
        (lit(1706400000L) + (col("user_id") % 8).cast("long") * 21600L).as("w_sec"))
        .filter(col("ts_sec") <= 1706572800L)
      val packed = (col("ts_sec") * 2147483648L + col("event_id"))
      val heads = ev.groupBy("chunk", "w_sec", "user_id").agg(
        max(packed).as("truth_k"),
        max(when(col("ts_sec") <= col("w_sec"), packed)).as("snap_k"),
        max(when(col("ts_sec") > col("w_sec"), packed)).as("stream_k"))
      heads
        .groupBy("chunk", "w_sec")
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("snap_k").isNotNull, 1L).otherwise(0L)).as("n_snapshot_rows"),
          sum(when(col("stream_k").isNotNull, 1L).otherwise(0L)).as("n_final_from_stream"),
          sum(when(col("stream_k").isNull && col("snap_k").isNotNull, 1L).otherwise(0L))
            .as("n_final_from_snapshot"),
          sum(when(coalesce(col("stream_k"), col("snap_k")) === col("truth_k"), 1L)
            .otherwise(0L)).as("n_state_matches"))
        .orderBy("chunk")
    }
  )
}
