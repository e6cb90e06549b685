package graft.streaming

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.functions._

/** Driver-visible entries for the streaming operators, run in batch mode
  * over `events` — the window expressions are identical in both modes, so
  * the DuckDB oracle validates exactly what the stream computes
  * (StreamOpsSpec drives the same functions through MemoryStream with
  * watermarks to cover the streaming-only semantics).
  */
object StreamShapeQueries {

  val defs: Seq[QueryDef] = Seq(

    // tumbling windows align to the epoch → DATE_TRUNC is the exact oracle
    QueryDef(
      "q_stream_tumbling",
      """SELECT DATE_TRUNC('hour', ts) AS window_start,
        |       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      StreamOps.tumblingCounts(
        Tables.events(s, d).filter(col("ts") < lit("2024-01-05 00:00:00").cast("timestamp")),
        "1 hour")
        .orderBy("window_start", "event_type")
    },

    // sliding windows: each event expands into width/slide buckets; the
    // DuckDB oracle replicates the expansion with generate_series
    QueryDef(
      "q_stream_sliding",
      """WITH e AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
        |expanded AS (
        |  SELECT DATE_TRUNC('hour', ts) - INTERVAL (h.h) HOUR AS window_start
        |  FROM e, (SELECT UNNEST(generate_series(0, 5)) AS h) h
        |)
        |SELECT window_start, window_start + INTERVAL 6 HOUR AS window_end,
        |       COUNT(*) AS n_events
        |FROM expanded
        |GROUP BY 1, 2
        |ORDER BY window_start""".stripMargin) { (s, d) =>
      StreamOps.slidingCounts(
        Tables.events(s, d).filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp")),
        width = "6 hours", slide = "1 hour")
        .orderBy("window_start")
    },

    // session windows (data-dependent boundaries): the batch-mode oracle is
    // the classic gaps-and-islands rewrite — a new session starts when the
    // gap since the previous event reaches the 30 min threshold (Spark's
    // session_window end is exclusive: diff == gap starts a new session).
    // The value sum goes through DECIMAL on both sides so it is
    // order-independent; StreamOpsSpec covers the streaming/watermark side.
    QueryDef(
      "q_stream_sessions",
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id <= 50),
        |marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |),
        |sessions AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      StreamOps.userSessions(
        Tables.events(s, d).filter(col("user_id") <= 50)
          .withColumn("value", col("value").cast("decimal(18,6)")),
        gap = "30 minutes")
        .withColumn("session_value", col("session_value").cast("double"))
        .orderBy("user_id", "session_start")
    },

    // stream-static enrichment: event stream ⋈ broadcast customer dim →
    // per-window per-segment rollup. The batch face below is the exact
    // oracle (same window expression, same DECIMAL-routed value sum);
    // StreamOpsSpec drives the same function through MemoryStream where the
    // static side joins every micro-batch.
    QueryDef(
      "q_stream_enrich",
      """SELECT DATE_TRUNC('hour', ts) AS window_start,
        |       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       c_mktsegment,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS seg_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, c_mktsegment""".stripMargin) { (s, d) =>
      StreamOps.enrichedSegmentWindows(
        Tables.events(s, d).filter(col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
          .withColumn("value", col("value").cast("decimal(18,6)")),
        Tables.customer(s, d), "1 hour")
        .withColumn("seg_value", col("seg_value").cast("double"))
        .orderBy("window_start", "c_mktsegment")
    },

    // incremental SCD2 maintenance: the flatMapGroupsWithState kernel run
    // in batch mode (each group sees all events at once, empty initial
    // state) emits exactly the closed-version set of the q_cdc_scd2 batch
    // window — one oracle validates both faces. StreamOpsSpec drives the
    // same function through MemoryStream micro-batches for the incremental
    // exactly-once emission.
    QueryDef(
      "q_cdc_scd2_stream",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id <= 40
        |), v AS (
        |  SELECT user_id,
        |         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_seq,
        |         event_type AS state, ts_sec AS valid_from_sec,
        |         LEAD(ts_sec) OVER w AS valid_to_sec
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |)
        |SELECT user_id, version_seq, state, valid_from_sec, valid_to_sec
        |FROM v WHERE valid_to_sec IS NOT NULL
        |ORDER BY user_id, version_seq""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.events(s, d).filter(col("user_id") <= 40)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
        .as[StreamOps.Scd2Event]
      StreamOps.scd2Closed(ds).toDF().orderBy("user_id", "version_seq")
    },

    // stream-stream interval join (attribution: purchase ← same user's
    // clicks in the trailing 24 h). The join condition is identical in both
    // modes, so the batch run IS the oracle-checkable face of the
    // streaming join; StreamOpsSpec drives the same function through two
    // MemoryStreams with watermarks for the cross-micro-batch semantics.
    // Timestamps are floored to whole seconds BEFORE the join and emitted
    // as epoch-second BIGINTs — the repo's boundary discipline for every
    // timestamp-sensitive query (sub-second components near a 24 h join
    // boundary must not decide membership differently in Spark vs DuckDB).
    QueryDef(
      "q_stream_interval_join",
      """WITH p AS (SELECT user_id, event_id,
        |                  CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec FROM events
        |           WHERE event_type = 'purchase' AND user_id <= 100),
        |c AS (SELECT user_id, event_id,
        |             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec FROM events
        |      WHERE event_type = 'click' AND user_id <= 100)
        |SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |       p.ts_sec AS purchase_ts_sec, c.ts_sec AS click_ts_sec
        |FROM p JOIN c ON p.user_id = c.user_id
        |            AND c.ts_sec >= p.ts_sec - 86400 AND c.ts_sec <= p.ts_sec
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") <= 100)
        // whole-second timestamps: keeps TimestampType (watermark-compatible
        // in the streaming face) while making the range predicate exact
        .withColumn("ts", date_trunc("second", col("ts")))
      StreamOps.intervalJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        "user_id", "24 hours")
        .select(
          col("l.user_id").as("user_id"),
          col("l.event_id").as("purchase_id"), col("r.event_id").as("click_id"),
          col("l.ts").cast("long").as("purchase_ts_sec"),
          col("r.ts").cast("long").as("click_ts_sec"))
        .orderBy("user_id", "purchase_id", "click_id")
    },

    // exactly-once-ify an at-least-once feed: events re-delivered later
    // (every 7th event_id, +120 s) are dropped by content digest, keeping
    // the earliest (ts, event_id) copy — StreamOps.dedupByDigest's batch
    // face; the streaming face (dropDuplicatesWithinWatermark, first
    // arrival == earliest under ordered replay) is covered by
    // StreamOpsSpec. Timestamps floored to epoch seconds at the boundary.
    QueryDef(
      "q_stream_dedup",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id <= 60),
        |feed AS (
        |  SELECT * FROM ev
        |  UNION ALL
        |  SELECT user_id, event_id, event_type, ts_sec + 120
        |  FROM ev WHERE event_id % 7 = 0),
        |kept AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY md5(CAST(event_id AS VARCHAR))
        |    ORDER BY ts_sec, event_id) AS rn
        |  FROM feed)
        |SELECT user_id, event_id, event_type, ts_sec
        |FROM kept WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") <= 60)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
      val redelivered = ev.filter(col("event_id") % 7 === 0)
        .withColumn("ts_sec", col("ts_sec") + 120)
      StreamOps.dedupByDigest(
        ev.unionAll(redelivered)
          .withColumn("ekey", col("event_id").cast("string")),
        tsCol = "ts_sec", contentCol = "ekey", idCol = "event_id")
        .select("user_id", "event_id", "event_type", "ts_sec")
        .orderBy("event_id")
    },

    // stream-stream LEFT OUTER interval join: q_stream_interval_join's
    // attribution shape, but purchases with NO click in the trailing 2 h
    // window survive with a NULL click — the semantics only an outer
    // stream-stream join provides (inner silently drops the unattributed
    // cohort, which is usually the cohort being measured). The streaming
    // face needs watermarks on both sides + the event-time range so the
    // null row can be emitted when the watermark closes the window;
    // StreamOps.intervalJoin carries both already, so the batch run below
    // is the oracle-checkable face of the identical join condition.
    // NULLS-FIRST click ordering is pinned explicitly: Spark ASC defaults
    // nulls-first, DuckDB nulls-last — the one place the engines' defaults
    // diverge on this query.
    QueryDef(
      "q_stream_left_outer",
      """WITH p AS (SELECT user_id, event_id,
        |                  CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec FROM events
        |           WHERE event_type = 'purchase' AND user_id <= 100),
        |c AS (SELECT user_id, event_id,
        |             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec FROM events
        |      WHERE event_type = 'click' AND user_id <= 100)
        |SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |       p.ts_sec AS purchase_ts_sec, c.ts_sec AS click_ts_sec
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |   AND c.ts_sec >= p.ts_sec - 7200 AND c.ts_sec <= p.ts_sec
        |ORDER BY p.user_id, purchase_id, click_id NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") <= 100)
        .withColumn("ts", date_trunc("second", col("ts")))
      StreamOps.intervalJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        "user_id", "2 hours", joinType = "left_outer")
        .select(
          col("l.user_id").as("user_id"),
          col("l.event_id").as("purchase_id"), col("r.event_id").as("click_id"),
          col("l.ts").cast("long").as("purchase_ts_sec"),
          col("r.ts").cast("long").as("click_ts_sec"))
        .orderBy(col("user_id"), col("purchase_id"), col("click_id").asc_nulls_first)
    },

    // per-(user, day) ingestion quota: first 2 events of a user's day are
    // accepted, the rest tagged rejected — StreamOps.rateLimit's batch face
    // (row_number ≤ cap under the (user, day) window); the streaming face
    // (flatMapGroupsWithState running count, cross-micro-batch state) is
    // driven by StreamOpsSpec. Day boundaries and acceptance both ride
    // floor-epoch-second integers.
    QueryDef(
      "q_rate_limit",
      """WITH ev0 AS (SELECT user_id, event_id,
        |                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |            FROM events WHERE user_id <= 120),
        |ev AS (SELECT *, ts_sec // 86400 AS day_num FROM ev0),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day_num
        |                                   ORDER BY ts_sec, event_id) AS rn
        |      FROM ev)
        |SELECT user_id, day_num, COUNT(*) AS n_events,
        |       COUNT(CASE WHEN rn <= 2 THEN 1 END) AS n_accepted,
        |       COUNT(CASE WHEN rn > 2 THEN 1 END) AS n_rejected,
        |       MAX(CASE WHEN rn = 2 THEN ts_sec END) AS quota_hit_sec
        |FROM r GROUP BY user_id, day_num
        |ORDER BY user_id, day_num""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).filter(col("user_id") <= 120)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("ts_sec"))
        .withColumn("day_num", expr("CAST(ts_sec DIV 86400 AS BIGINT)"))
        .select("user_id", "day_num", "event_id", "ts_sec")
        .as[StreamOps.QuotaEvent]
      val tagged = StreamOps.rateLimit(ev, cap = 2).toDF()
      // the accepted set is exactly the first ≤2 events, so when the cap
      // was reached the 2nd event's ts IS the max accepted ts
      tagged.groupBy("user_id", "day_num")
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("accepted"), 1)).as("n_accepted"),
          count(when(!col("accepted"), 1)).as("n_rejected"),
          max(when(col("accepted"), col("ts_sec"))).as("max_acc_sec"))
        .select(col("user_id"), col("day_num"), col("n_events"),
          col("n_accepted"), col("n_rejected"),
          when(col("n_accepted") === 2, col("max_acc_sec")).as("quota_hit_sec"))
        .orderBy("user_id", "day_num")
    },

    // per-day distinct active user-hours as STREAMING STATE: the batch face
    // of StreamOps.dailyDistinctHll (native md5 registers, m = 128, raw-HLL
    // integer estimate) joined to its exact ground truth; the streaming
    // face maintains the same registers across micro-batches in
    // flatMapGroupsWithState and is proven snapshot-equal to this batch
    // face by StreamOpsSpec (q_rate_limit's proof pattern). The oracle
    // rebuilds the registers from the hex md5 chain, so the gate also
    // re-proves the native hash derivation end to end.
    QueryDef(
      "q_stream_distinct_hll",
      """WITH e AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num,
        |                  CAST(user_id AS VARCHAR) || ':' || CAST(EXTRACT(hour FROM ts) AS VARCHAR) AS uh
        |           FROM events),
        |h AS (SELECT day_num,
        |        CAST(('0x' || substr(md5('sdh:' || uh), 1, 2)) AS BIGINT) % 128 AS bucket,
        |        CAST(('0x' || substr(md5('sdh:' || uh), 3, 8)) AS BIGINT) AS hv
        |      FROM e),
        |rho AS (SELECT day_num, bucket,
        |               MAX(CASE WHEN hv = 0 THEN 33 ELSE 33 - length(bin(hv)) END) AS r
        |        FROM h GROUP BY 1, 2),
        |grid AS (SELECT d.day_num, g.bucket
        |         FROM (SELECT DISTINCT day_num FROM e) d,
        |              (SELECT UNNEST(generate_series(0, 127)) AS bucket) g),
        |reg AS (SELECT g.day_num, g.bucket, COALESCE(r.r, 0) AS r
        |        FROM grid g LEFT JOIN rho r ON g.day_num = r.day_num AND g.bucket = r.bucket),
        |s AS (SELECT day_num, CAST(SUM(1::BIGINT << (33 - r)) AS BIGINT) AS ssum
        |      FROM reg GROUP BY 1),
        |cnt AS (SELECT day_num, COUNT(*) AS n_seen, COUNT(DISTINCT uh) AS n_exact
        |        FROM e GROUP BY 1)
        |SELECT c.day_num, n_seen, n_exact,
        |       (11719 * (1::BIGINT << 33)) // ssum AS n_est,
        |       ABS((11719 * (1::BIGINT << 33)) // ssum - n_exact) * 1000 // n_exact AS err_permille
        |FROM cnt c JOIN s ON c.day_num = s.day_num
        |ORDER BY c.day_num""".stripMargin) { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d).select(
        expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)").as("day_num"),
        concat(col("user_id").cast("string"), lit(":"),
          hour(col("ts")).cast("string")).as("uh"))
      val snaps = StreamOps.dailyDistinctHll(e.as[StreamOps.HllIn]).toDF()
      val exact = e.groupBy("day_num").agg(countDistinct("uh").as("n_exact"))
      snaps.join(exact, "day_num")
        .select(col("day_num"), col("n_seen"), col("n_exact"), col("n_est"),
          expr("ABS(n_est - n_exact) * 1000 DIV n_exact").as("err_permille"))
        .orderBy("day_num")
    },

    // per-day distinct as STREAMING KMV STATE: the batch face of
    // StreamOps.dailyDistinctKmv (k=256 min 48-bit md5 hashes, two-level
    // salt-local k-min, exact-below-k estimator) against its exact ground
    // truth; StreamOpsSpec proves the streaming state face snapshot-equal.
    // The oracle re-derives the sketch from the hex md5 chain, so the
    // k-min selection AND the (k−1)·2⁴⁸//h_k estimator are re-proven in
    // DuckDB integer arithmetic.
    QueryDef(
      "q_stream_distinct_kmv",
      """WITH e AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num,
        |                  CAST(user_id AS VARCHAR) || ':' || CAST(EXTRACT(hour FROM ts) AS VARCHAR) AS uh
        |           FROM events),
        |h AS (SELECT DISTINCT day_num,
        |             CAST(('0x' || substr(md5('sdk:' || uh), 1, 12)) AS BIGINT) AS hv
        |      FROM e),
        |rk AS (SELECT day_num, hv, ROW_NUMBER() OVER (PARTITION BY day_num ORDER BY hv) AS r FROM h),
        |sk AS (SELECT day_num, COUNT(*) AS n_members, MAX(hv) AS kth
        |       FROM rk WHERE r <= 256 GROUP BY 1),
        |cnt AS (SELECT day_num, COUNT(*) AS n_seen, COUNT(DISTINCT uh) AS n_exact
        |        FROM e GROUP BY 1)
        |SELECT c.day_num, n_seen, n_members,
        |       CASE WHEN n_members < 256 THEN n_members
        |            ELSE (255::BIGINT << 48) // kth END AS n_est,
        |       n_exact,
        |       ABS(CASE WHEN n_members < 256 THEN n_members
        |                ELSE (255::BIGINT << 48) // kth END - n_exact) * 1000 // n_exact AS err_permille
        |FROM cnt c JOIN sk USING (day_num)
        |ORDER BY c.day_num""".stripMargin) { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d).select(
        expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)").as("day_num"),
        concat(col("user_id").cast("string"), lit(":"),
          hour(col("ts")).cast("string")).as("uh"))
      val snaps = StreamOps.dailyDistinctKmv(e.as[StreamOps.HllIn]).toDF()
      val exact = e.groupBy("day_num").agg(countDistinct("uh").as("n_exact"))
      snaps.join(exact, "day_num")
        .select(col("day_num"), col("n_seen"), col("n_members"), col("n_est"),
          col("n_exact"),
          expr("ABS(n_est - n_exact) * 1000 DIV n_exact").as("err_permille"))
        .orderBy("day_num")
    },

    // per-day heavy hitters from STREAMING CMS STATE: the batch face of
    // StreamOps.dailyCmsCounters (depth 4 × width 512 additive counters,
    // native md5 row hashes) probed for each day's candidate keys —
    // estimate = min over rows — and top-5'd per day. n_est ≥ n_true
    // always (CMS never undercounts); the oracle rebuilds the counters
    // and the min-probe in DuckDB from the same hex chain. At scale the
    // candidates come from the bounded user dimension; the counters are
    // the only thing the stream maintains (16 KiB per day).
    QueryDef(
      "q_stream_heavy_cms",
      """WITH e AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num,
        |                  CAST(user_id AS VARCHAR) AS u
        |           FROM events),
        |g AS (SELECT UNNEST(generate_series(0, 3)) AS i),
        |cells AS (SELECT day_num, i,
        |                 CAST(('0x' || substr(md5('cms' || i || ':' || u), 1, 3)) AS BIGINT) // 8 AS slot
        |          FROM e, g),
        |counters AS (SELECT day_num, i, slot, COUNT(*) AS cnt FROM cells GROUP BY 1, 2, 3),
        |cand AS (SELECT day_num, u, COUNT(*) AS n_true FROM e GROUP BY 1, 2),
        |probe AS (SELECT day_num, u, n_true, i,
        |                 CAST(('0x' || substr(md5('cms' || i || ':' || u), 1, 3)) AS BIGINT) // 8 AS slot
        |          FROM cand, g),
        |est AS (SELECT p.day_num, p.u, MAX(p.n_true) AS n_true, MIN(c.cnt) AS n_est
        |        FROM probe p JOIN counters c
        |          ON p.day_num = c.day_num AND p.i = c.i AND p.slot = c.slot
        |        GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY day_num ORDER BY n_est DESC, u) AS r
        |       FROM est)
        |SELECT day_num, u AS user_key, n_true, n_est, n_est - n_true AS overcount
        |FROM rk WHERE r <= 5
        |ORDER BY day_num, n_est DESC, user_key""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.graft.SketchExpressions
      val e = Tables.events(s, d).select(
        expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)").as("day_num"),
        col("user_id").cast("string").as("key"))
      val counters = StreamOps.dailyCmsCounters(e.as[StreamOps.CmsIn]).toDF()
        .select("day_num", "i", "slot", "cnt")
      val cand = e.groupBy("day_num", "key").agg(count(lit(1)).as("n_true"))
      val probe = cand.select(
          Seq(col("day_num"), col("key"), col("n_true")) ++
            (0 until StreamOps.CmsDepth).map { i =>
              SketchExpressions.md5Hi64(concat(lit(s"cms$i:"), col("key"))).as(s"h$i")
            }: _*)
        .select(col("day_num"), col("key"), col("n_true"),
          explode(array((0 until StreamOps.CmsDepth).map { i =>
            struct(lit(i).as("i"), expr(s"shiftrightunsigned(h$i, 55)").as("slot"))
          }: _*)).as("c"))
        .select(col("day_num"), col("key"), col("n_true"),
          col("c.i").as("i"), col("c.slot").as("slot"))
      val est = probe.join(counters, Seq("day_num", "i", "slot"))
        .groupBy("day_num", "key")
        .agg(max("n_true").as("n_true"), min("cnt").as("n_est"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("day_num").orderBy(col("n_est").desc, col("key"))
      est.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .select(col("day_num"), col("key").as("user_key"),
          col("n_true"), col("n_est"), (col("n_est") - col("n_true")).as("overcount"))
        .orderBy(col("day_num"), col("n_est").desc, col("user_key"))
    },

    // per-day quantiles from STREAMING HISTOGRAM STATE: the batch face of
    // StreamOps.dailyValueHist (256 additive bins of width 2 over
    // [0, 512)) read out at p50/p90/p99 — estimate = upper edge of the
    // first bin whose cumulative count reaches ⌈q·n⌉, so the error is
    // bounded by one bin width by construction — next to the EXACT
    // per-day percentile (Spark's exact `percentile` == DuckDB's
    // quantile_cont, both linear-interpolating the same doubles). The
    // distribution sibling of the distinct (HLL/KMV) and frequency (CMS)
    // state faces: 2 KiB per active day at any volume; StreamOpsSpec
    // proves the streaming snapshot equals this batch face row for row.
    // The cumulative-bin window rides the CONSTANT 256-bin grid per day,
    // never the events — the same corpus-size-independent readout shape
    // as q_classifier_auc's histogram AUC.
    QueryDef(
      "q_stream_quantile_hist",
      """WITH e AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num, value AS v
        |           FROM events),
        |bins AS (SELECT day_num,
        |                CAST(LEAST(255.0, GREATEST(0.0, FLOOR(v / 2.0))) AS INT) AS bin,
        |                COUNT(*) AS cnt
        |         FROM e GROUP BY 1, 2),
        |cum AS (SELECT day_num, bin,
        |               SUM(cnt) OVER (PARTITION BY day_num ORDER BY bin) AS c
        |        FROM bins),
        |n AS (SELECT day_num, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |t AS (SELECT day_num, n, unnest([500, 900, 990]) AS qp FROM n),
        |sel AS (SELECT t.day_num, qp, CAST(MIN(bin) AS BIGINT) AS hist_bin
        |        FROM t JOIN cum ON cum.day_num = t.day_num
        |                       AND cum.c >= (t.n * qp + 999) // 1000
        |        GROUP BY 1, 2),
        |exq AS (SELECT day_num, quantile_cont(v, [0.5, 0.9, 0.99]) AS qs
        |        FROM e GROUP BY 1),
        |ex AS (SELECT day_num, unnest([500, 900, 990]) AS qp,
        |              ROUND(unnest(qs), 6) AS exact_v
        |       FROM exq)
        |SELECT s.day_num, CAST(qp AS BIGINT) AS q_permille, hist_bin,
        |       (hist_bin + 1) * 2000000 AS est_hi_x1m, exact_v
        |FROM sel s JOIN ex USING (day_num, qp)
        |ORDER BY day_num, q_permille""".stripMargin) { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d).select(
        expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)").as("day_num"),
        col("value").as("v"))
      val cells = StreamOps.dailyValueHist(e.as[StreamOps.HistIn]).toDF()
      val cum = cells.withColumn("c", sum("cnt").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("day_num").orderBy("bin")))
        .drop("n_seen") // targets re-joins it; keeping both is ambiguous
      val targets = cells.select("day_num", "n_seen").distinct()
        .select(col("day_num"), col("n_seen"),
          explode(expr("array(500, 900, 990)")).as("qp"))
      val sel = targets.join(cum, Seq("day_num"))
        .filter(col("c") >= expr("(n_seen * qp + 999) DIV 1000"))
        .groupBy("day_num", "qp").agg(min("bin").cast("long").as("hist_bin"))
      val exact = e.groupBy("day_num")
        .agg(expr("percentile(v, array(0.5D, 0.9D, 0.99D))").as("qs"))
        .select(col("day_num"), posexplode(col("qs")).as(Seq("pos", "ev")))
        .select(col("day_num"),
          expr("element_at(array(500, 900, 990), pos + 1)").as("qp"),
          round(col("ev"), 6).as("exact_v"))
      sel.join(exact, Seq("day_num", "qp"))
        .select(col("day_num"), col("qp").cast("long").as("q_permille"),
          col("hist_bin"), ((col("hist_bin") + 1) * 2000000L).as("est_hi_x1m"),
          col("exact_v"))
        .orderBy("day_num", "q_permille")
    },

    // per-day quantiles from STREAMING UNBOUNDED-DOMAIN SKETCH STATE: the
    // batch face of StreamOps.dailyQuantileSketch —
    // graft.functions.QuantileSketch's HDR-style buckets over integer
    // milli-values (FLOOR(value·1000): [10, 490020] here, any non-negative
    // long in general — the r13 hist face's [0, 512) pre-bound is gone).
    // Readout: first bucket whose cumulative count reaches ⌈q·n⌉; that
    // bucket contains the exact order statistic by construction, so the
    // gate emits both bucket bounds, the exact discrete percentile, and
    // the containment flag — every column BIGINT, bit-exact cross-engine
    // (vs the hist gate's one-double exact_v). ≤ 1888 additive counters
    // = 15 KiB per day at any volume; StreamOpsSpec proves the streaming
    // snapshot equals this batch face and the split/order merge law.
    QueryDef(
      "q_stream_quantile_sketch", {
        import graft.functions.QuantileSketch
        s"""WITH qsv AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day_num,
           |                    CAST(FLOOR(value * 1000) AS BIGINT) AS v
           |             FROM events),
           |${QuantileSketch.readoutSql("day_num")}""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      import graft.functions.QuantileSketch
      val e = Tables.events(s, d).select(
        expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)").as("day_num"),
        expr("CAST(FLOOR(value * 1000) AS BIGINT)").as("v"))
      // counts and totals come from the STATE FACE's cells — the gate
      // proves the maintained counters drive the readout; only the exact
      // verification side reads raw values
      val cells = StreamOps.dailyQuantileSketch(e.as[StreamOps.QsIn]).toDF()
      val counts = cells.select(col("day_num"), col("bucket").as("id"), col("cnt"))
      val totals = cells.select("day_num", "n_seen").distinct()
        .select(col("day_num"), col("n_seen").as("n"))
      QuantileSketch.readout(counts, totals, e, "day_num")
    }
  )
}
