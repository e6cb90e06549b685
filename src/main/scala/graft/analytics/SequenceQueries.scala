package graft.analytics

import graft.QueryDef
import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over `events`: as-of alignment, funnel
  * conversion, retention cohorts — the product-analytics shapes a CDC-fed
  * events table exists to answer.
  */
object SequenceQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----- backward AS-OF join: each purchase ↔ the user's latest prior view -----
    // Oracle: DuckDB's native ASOF JOIN (inclusive backward semantics).
    QueryDef(
      "q_asof_purchase_view",
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       STRFTIME(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts,
        |       CAST(v.value AS DOUBLE) AS last_view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id <= 100) p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val purchases = events.filter(col("event_type") === "purchase" && col("user_id") <= 100)
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.backward(purchases, views, key = "user_id",
        leftTs = "ts", rightTs = "ts",
        rightCols = Map("ts" -> "last_view_ts_raw", "value" -> "last_view_value"))
        .select(
          col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("last_view_ts_raw"), "yyyy-MM-dd HH:mm:ss").as("last_view_ts"),
          col("last_view_value").cast("double"))
        .orderBy("purchase_id")
    },

    // ----- funnel conversion: view → click → purchase in strict order -----
    QueryDef(
      "q_funnel_conversion",
      """WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
        |       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
        |       (SELECT COUNT(*) FROM p) AS n_purchased_after_click""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = e.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id"))
        .filter(col("e.ts") > col("v_ts"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("c_ts"))
      val p = e.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id"))
        .filter(col("e.ts") > col("c_ts"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("p_ts"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_after_click")))
    },

    // ----- gap-based sessionization (30-minute inactivity timeout) -----
    // The standard web-analytics session definition: a session breaks when
    // the gap to the previous event of the same user exceeds 30 minutes.
    // Two windows — LAG for the break flag, then a running SUM for the
    // session index — share the (user_id) partitioning and (ts_sec,
    // event_id) ordering, so Spark plans ONE exchange + ONE sort for both;
    // the final groupBy(user_id, session_idx) is subset-clustered on
    // user_id and reuses the same exchange (asserted in PlanAuditSpec).
    //
    // Gap arithmetic and outputs are floor-epoch-second BIGINTs for the
    // same ns-vs-µs reason as q_cdc_scd2.
    QueryDef(
      "q_sessionize",
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id <= 60
        |), flagged AS (
        |  SELECT user_id, event_id, ts_sec,
        |         CASE WHEN LAG(ts_sec) OVER w IS NULL
        |                OR ts_sec - LAG(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |), sess AS (
        |  SELECT user_id, ts_sec,
        |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       COUNT(*) AS n_events,
        |       MIN(ts_sec) AS session_start_sec,
        |       MAX(ts_sec) AS session_end_sec,
        |       CAST(MAX(ts_sec) - MIN(ts_sec) AS BIGINT) AS duration_sec
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      val ev = Tables.events(s, d)
        .filter(col("user_id") <= 60)
        .select(col("user_id"), col("event_id"), col("ts").cast("long").as("ts_sec"))
      val flagged = ev.withColumn("is_new",
        when(lag(col("ts_sec"), 1).over(w).isNull ||
          col("ts_sec") - lag(col("ts_sec"), 1).over(w) > 1800, 1).otherwise(0))
      val sess = flagged.withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_sec")).as("session_start_sec"),
          max(col("ts_sec")).as("session_end_sec"),
          (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
        .orderBy("user_id", "session_idx")
    },

    // ----- retention cohorts: first-seen week × weekly activity offsets -----
    QueryDef(
      "q_retention_cohorts",
      """WITH firsts AS (SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week FROM events GROUP BY 1),
        |activity AS (SELECT DISTINCT e.user_id, DATE_TRUNC('week', e.ts) AS active_week FROM events e)
        |SELECT f.cohort_week,
        |       CAST(DATE_DIFF('week', f.cohort_week, a.active_week) AS INT) AS week_offset,
        |       COUNT(DISTINCT f.user_id) AS n_users
        |FROM firsts f JOIN activity a ON f.user_id = a.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      // cast to date: DuckDB's DATE_TRUNC('week') returns DATE, Spark's a timestamp.
      // One scan: distinct (user, week) first — the cohort week is then a
      // window-min over that (already small) set, replacing the separate
      // firsts aggregate + join. And since (user, week) rows are unique, a
      // user contributes at most one row per (cohort, offset) group, so
      // COUNT(*) replaces COUNT(DISTINCT user) — no distinct expansion.
      val weekly = e
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("active_week"))
        .distinct()
      val withCohort = weekly.withColumn("cohort_week",
        min(col("active_week")).over(Window.partitionBy("user_id")))
      withCohort
        .groupBy(col("cohort_week"),
          (datediff(col("active_week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // ----- Gap-fill + forward-fill resample (daily last-observation) -----
    // The time-series normalization step feature pipelines need before
    // any per-day join or model input: resample each user's event stream
    // to a DENSE daily grid (their own first..last active day) and carry
    // the last observed value across silent days (LOCF). The observed
    // value per day is the day's LAST event (latest ts, event_id
    // tiebreak) — a deterministic "daily close".
    //
    // Scale: the grid explodes one row per user-day — output-sized, never
    // corpus-squared; its generation is keyed by user and inherits the
    // same hash partitioning as the observation join and the forward-fill
    // window, so the whole resample rides ONE exchange by user. The fill
    // itself is last(ignoreNulls) over an unbounded-preceding ROWS frame
    // — running-state, no per-row rescans. Values are COPIED, never
    // combined, so no float arithmetic exists to diverge cross-engine.
    // The user_id cap keeps the oracle's grid reviewable, as with the
    // other event-family oracles.
    QueryDef(
      "q_gapfill_ffill",
      """WITH ev AS (SELECT * FROM events WHERE user_id <= 30),
        |obs AS (SELECT user_id, day, value AS close FROM (
        |          SELECT user_id, CAST(ts AS DATE) AS day, value,
        |                 ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                                    ORDER BY ts DESC, event_id DESC) AS rn
        |          FROM ev) WHERE rn = 1),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1),
        |grid AS (SELECT user_id,
        |                CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |                                            CAST(d1 AS TIMESTAMP),
        |                                            INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM span)
        |SELECT g.user_id, g.day,
        |       LAST_VALUE(o.close IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_close,
        |       o.close IS NOT NULL AS is_observed
        |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
        |ORDER BY g.user_id, g.day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") <= 30)
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val obs = ev
        .withColumn("day", col("ts").cast("date"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("close"))
      val grid = obs.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wFill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("close"), ignoreNulls = true).over(wFill).as("filled_close"),
          col("close").isNotNull.as("is_observed"))
        .orderBy("user_id", "day")
    },

    // ----- Sequence-pattern detection (MATCH_RECOGNIZE shape) -----
    // Detect CONSECUTIVE view→click→purchase runs per user — the
    // row-pattern-matching workload (SQL:2016 MATCH_RECOGNIZE, Flink CEP)
    // for a fixed-length pattern, expressed as window `lead`s over the
    // user's (ts, event_id)-ordered stream: each row sees the next two
    // event types, and a pattern instance is a single codegen'd predicate.
    // Longer fixed patterns add leads; variable-length patterns (A B* C)
    // are where a real NFA operator — flatMapGroups with sorted groups —
    // would take over, with this same per-user partitioning.
    //
    // Scale: ONE exchange keyed by user_id feeds both the leads and the
    // per-user aggregate; per-user streams are never materialized beyond
    // the 2-row lead lookahead. Deterministic: ties in ts break by
    // event_id in the window order, and the count/min aggregates are
    // order-free.
    QueryDef(
      "q_seq_pattern",
      """WITH o AS (
        |  SELECT user_id, ts, event_type,
        |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
        |         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_patterns,
        |       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_match_ts
        |FROM o
        |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t1", lead("event_type", 1).over(w))
        .withColumn("t2", lead("event_type", 2).over(w))
        .filter(col("event_type") === "view" && col("t1") === "click" &&
          col("t2") === "purchase")
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_patterns"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_match_ts"))
        .orderBy("user_id")
    },

    // ----- First-touch attribution (earliest view in a 7-day lookback) -----
    // Marketing attribution's other half: q_asof_purchase_view binds each
    // purchase to the LATEST prior view (last-touch); this binds it to the
    // EARLIEST view inside a bounded lookback window — which an AS-OF join
    // cannot express (as-of is latest-before by construction; first-touch
    // needs min-within-range). Shape: user-keyed equi-join with the range
    // as a join predicate, then a per-purchase min/count aggregate. The
    // window bound is what keeps it scalable — per-purchase fan-out is the
    // user's 7-day view count, never their full history (the same
    // bounded-interval argument as the stream-stream interval join).
    QueryDef(
      "q_first_touch",
      """WITH p AS (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'purchase' AND user_id <= 100),
        |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       STRFTIME(MIN(v.ts), '%Y-%m-%d %H:%M:%S') AS first_touch_ts,
        |       COUNT(v.ts) AS n_touches
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL 7 DAY AND v.ts <= p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase" && col("user_id") <= 100)
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      p.join(v,
          p("user_id") === v("user_id") &&
            col("v_ts") >= col("ts") - expr("INTERVAL 7 DAY") &&
            col("v_ts") <= col("ts"),
          "left")
        .groupBy(col("purchase_id"), p("user_id"), col("ts"))
        .agg(
          min(col("v_ts")).as("ft"),
          count(col("v_ts")).as("n_touches"))
        .select(
          col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("ft"), "yyyy-MM-dd HH:mm:ss").as("first_touch_ts"),
          col("n_touches"))
        .orderBy("purchase_id")
    }
  )
}
