package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.streaming.StreamOps.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(t: String, user: Long, typ: String = "view", v: Double = 1.0) =
    UserEvent(user, ts(t), typ, v)

  test("tumbling counts over a real stream honor the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val query = StreamOps.tumblingCounts(input.toDF(), "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        ev("2024-01-01 10:05:00", 1), ev("2024-01-01 10:35:00", 2),
        ev("2024-01-01 11:10:00", 1))
      query.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .groupBy("window_start", "event_type").agg(max("n_events").as("n"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
      assert(rows("2024-01-01 10:00:00.0") == 2)
      assert(rows("2024-01-01 11:00:00.0") == 1)

      // an event older than watermark (11:10 - 30m) must be dropped
      input.addData(ev("2024-01-01 09:00:00", 3))
      query.processAllAvailable()
      val afterLate = spark.table("tumbling_out")
        .filter($"window_start" === lit("2024-01-01 09:00:00").cast("timestamp")).count()
      assert(afterLate == 0, "late event beyond watermark should be dropped")
    } finally query.stop()
  }

  test("stream-static enrichment joins the broadcast dim on every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "RETAIL")).toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[UserEvent]
    val query = StreamOps.enrichedSegmentWindows(input.toDF(), dim, "1 hour")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        ev("2024-01-01 10:05:00", 1, v = 2.0), ev("2024-01-01 10:15:00", 2, v = 3.0),
        ev("2024-01-01 10:25:00", 9, v = 99.0)) // user 9 not in dim → dropped
      query.processAllAvailable()
      // second micro-batch: the static side must join again (same window)
      input.addData(ev("2024-01-01 10:45:00", 1, v = 5.0))
      query.processAllAvailable()
      val rows = spark.table("enrich_out")
        .groupBy("c_mktsegment")
        .agg(max("n_events").as("n"), max("seg_value").as("v"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(rows("AUTO") == ((2L, 7.0)), s"got $rows")
      assert(rows("RETAIL") == ((1L, 3.0)), s"got $rows")
      assert(!rows.contains(null), "unmatched user must not survive the inner join")
    } finally query.stop()
  }

  test("streaming dedup drops same-digest docs across micro-batches, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamOps.dedupByDigest(docs, "ts", "text", "doc_id", lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha beta"),
        (2L, ts("2024-01-01 10:01:00"), "alpha beta"), // same batch dup
        (3L, ts("2024-01-01 10:02:00"), "gamma"))
      query.processAllAvailable()
      // cross-batch dup within the watermark horizon
      input.addData((4L, ts("2024-01-01 10:30:00"), "alpha beta"))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally query.stop()

    // batch mode: exact dedup keeping the earliest (ts, id) — deterministic
    val batch = Seq(
      (2L, ts("2024-01-01 10:05:00"), "x y z"),
      (1L, ts("2024-01-01 10:00:00"), "x y z")).toDF("doc_id", "ts", "text")
    val kept = StreamOps.dedupByDigest(batch, "ts", "text", "doc_id").collect()
    assert(kept.length == 1 && kept(0).getLong(0) == 1L)
  }

  test("session windows split on the inactivity gap (batch = stream semantics)") {
    val events = Seq(
      ev("2024-01-01 10:00:00", 1, v = 5.0),
      ev("2024-01-01 10:10:00", 1, v = 2.0), // same session (gap 30m)
      ev("2024-01-01 11:30:00", 1, v = 1.0), // new session
      ev("2024-01-01 10:00:00", 2, v = 9.0)
    ).toDF()
    val out = StreamOps.userSessions(events, gap = "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("session_value") == 7.0)
    assert(out(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:40:00")) // last event + gap
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2)
  }

  test("flatMapGroupsWithState keeps running totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val query = StreamOps.runningUserTotals(input.toDS(), anomalyThreshold = 10.0)
      .writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev("2024-01-01 10:00:00", 1, v = 4.0), ev("2024-01-01 10:01:00", 1, v = 3.0))
      query.processAllAvailable()
      input.addData(ev("2024-01-01 10:02:00", 1, v = 5.0)) // crosses threshold: 12 > 10
      query.processAllAvailable()
      val updates = spark.table("running_out").orderBy("nEvents").collect()
      assert(updates.length == 2)
      assert(updates(0).getAs[Long]("nEvents") == 2 && updates(0).getAs[Double]("totalValue") == 7.0)
      assert(!updates(0).getAs[Boolean]("anomalous"))
      assert(updates(1).getAs[Long]("nEvents") == 3 && updates(1).getAs[Double]("totalValue") == 12.0)
      assert(updates(1).getAs[Boolean]("anomalous"))
    } finally query.stop()
  }

  test("streaming SCD2 emits each closed version exactly once across micro-batches") {
    import graft.streaming.StreamOps.Scd2Event
    implicit val sqlCtx = spark.sqlContext
    // two keys, versions deliberately spanning batch boundaries; key 2's
    // final state is a tombstone (stays open — never emitted to history)
    val all = Seq(
      Scd2Event(1L, 10L, "view", 1000L), Scd2Event(2L, 11L, "view", 1100L),
      Scd2Event(1L, 12L, "click", 2000L), Scd2Event(1L, 13L, "view", 2000L),
      Scd2Event(2L, 14L, "purchase", 3100L),
      Scd2Event(1L, 15L, "purchase", 5000L), Scd2Event(2L, 16L, "error", 6000L))
    val input = MemoryStream[Scd2Event]
    val query = StreamOps.scd2Closed(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(all.take(2): _*)
      query.processAllAvailable()
      val afterB1 = spark.table("scd2_out").count()
      assert(afterB1 == 0, "nothing closed after one event per key")
      input.addData(all.slice(2, 5): _*)
      query.processAllAvailable()
      input.addData(all.drop(5): _*)
      query.processAllAvailable()
      val streamed = spark.table("scd2_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      // batch mode = the whole feed in one group call with empty state
      val batch = StreamOps.scd2Closed(all.toDS()).collect()
        .map(c => (c.user_id, c.version_seq, c.state, c.valid_from_sec, c.valid_to_sec))
        .toSeq.sorted
      assert(streamed == batch, s"streamed $streamed != batch $batch")
      assert(streamed.size == streamed.distinct.size, "a closed version was emitted twice")
      // key 1: view→click(zero-length at the 2000 tie, event_id order)→view→purchase
      assert(streamed.filter(_._1 == 1L).map(_._3) == Seq("view", "click", "view"))
      // the open versions (key 1 'purchase', key 2 'error') are state, not history
      assert(!streamed.exists(v => v._1 == 2L && v._3 == "error"))
    } finally query.stop()
  }

  test("interval join pairs across micro-batches within the lookback") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val purchases = MemoryStream[UserEvent]
    val joined = StreamOps.intervalJoin(
      purchases.toDF(), clicks.toDF(), "user_id", "1 hour", lateness = "30 minutes")
      .select(
        col("l.user_id").as("user_id"),
        col("l.ts").as("purchase_ts"), col("r.ts").as("click_ts"))
    val query = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: clicks only — their state must persist for later purchases
      clicks.addData(
        ev("2024-01-01 10:00:00", 1, "click"),
        ev("2024-01-01 10:40:00", 1, "click"),
        ev("2024-01-01 08:00:00", 2, "click"))
      query.processAllAvailable()
      // batch 2: purchase at 10:50 joins both user-1 clicks (within 1 h),
      // not user 2's; user-2 purchase at 10:00 is 2 h after its click → no pair
      purchases.addData(
        ev("2024-01-01 10:50:00", 1, "purchase"),
        ev("2024-01-01 10:00:00", 2, "purchase"))
      query.processAllAvailable()
      val rows = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString)).sorted
      assert(rows.toSeq == Seq(
        (1L, "2024-01-01 10:00:00.0"), (1L, "2024-01-01 10:40:00.0")), rows.mkString(","))
    } finally query.stop()

    // batch mode: identical condition, inclusive bounds
    val p = Seq(ev("2024-01-01 12:00:00", 1, "purchase")).toDF()
    val c = Seq(
      ev("2024-01-01 11:00:00", 1, "click"),  // exactly lookback ago: included
      ev("2024-01-01 12:00:00", 1, "click"),  // same instant: included
      ev("2024-01-01 10:59:59", 1, "click"),  // just beyond: excluded
      ev("2024-01-01 12:00:01", 1, "click")   // future: excluded
    ).toDF()
    val out = StreamOps.intervalJoin(p, c, "user_id", "1 hour")
      .select(col("r.ts")).collect().map(_.getTimestamp(0).toString).sorted
    assert(out.toSeq == Seq("2024-01-01 11:00:00.0", "2024-01-01 12:00:00.0"))
  }

  test("interval join equals the brute-force pairing on random event sets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = ts("2024-01-01 00:00:00").getTime
    val genSide = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        mins <- Gen.chooseNum(0L, 300L)
      } yield (u, mins)))
    val prop = Prop.forAllNoShrink(genSide, genSide) { (ls, rs) =>
      def df(evs: List[(Long, Long)]) = evs.map { case (u, m) =>
        UserEvent(u, new Timestamp(base + m * 60000L), "e", 1.0)
      }.toDF()
      val got = StreamOps.intervalJoin(df(ls), df(rs), "user_id", "1 hour")
        .select(col("l.user_id"), col("l.ts"), col("r.ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
        .toList.sorted
      val want = (for {
        (lu, lm) <- ls
        (ru, rm) <- rs
        if lu == ru && rm >= lm - 60 && rm <= lm
      } yield (lu, base + lm * 60000L, base + rm * 60000L)).sorted
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("sliding windows cover each event width/slide times") {
    val events = Seq(ev("2024-01-01 10:30:00", 1)).toDF()
    val out = StreamOps.slidingCounts(events, "6 hours", "1 hour").collect()
    assert(out.length == 6) // one event appears in exactly 6 hourly-sliding 6h windows
    assert(out.forall(_.getAs[Long]("n_events") == 1))
  }

  test("rate limit: quota state persists across micro-batches and matches the batch face") {
    import graft.streaming.StreamOps.QuotaEvent
    implicit val sqlCtx = spark.sqlContext
    // key (1, day 0): 7 events split 3 + 4 across batches — cap 5 must
    // accept the first 5 ACROSS the boundary (2 from batch 2), which only
    // per-key state can get right; key (2, day 0) stays under quota
    val all = Seq(
      QuotaEvent(1L, 0L, 10L, 100L), QuotaEvent(1L, 0L, 11L, 200L),
      QuotaEvent(1L, 0L, 12L, 300L), QuotaEvent(2L, 0L, 13L, 150L),
      QuotaEvent(1L, 0L, 14L, 400L), QuotaEvent(1L, 0L, 15L, 500L),
      QuotaEvent(1L, 0L, 16L, 600L), QuotaEvent(1L, 0L, 17L, 700L),
      QuotaEvent(2L, 0L, 18L, 250L))
    val input = MemoryStream[QuotaEvent]
    val query = StreamOps.rateLimit(input.toDS(), cap = 5)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(all.take(4): _*)
      query.processAllAvailable()
      input.addData(all.drop(4): _*)
      query.processAllAvailable()
      val streamed = spark.table("quota_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4))).toSeq.sorted
      val batch = StreamOps.rateLimit(all.toDS(), cap = 5).collect()
        .map(t => (t.user_id, t.event_id, t.accepted)).toSeq.sorted
      assert(streamed == batch, s"streamed $streamed != batch $batch")
      // key 1: exactly 5 accepted (events 10,11,12,14,15), 16/17 rejected
      assert(streamed.filter(t => t._1 == 1L && t._3).map(_._2) == Seq(10L, 11L, 12L, 14L, 15L))
      assert(streamed.filter(t => t._1 == 1L && !t._3).map(_._2) == Seq(16L, 17L))
      assert(streamed.filter(_._1 == 2L).forall(_._3), "under-quota key fully accepted")
    } finally query.stop()
  }

  test("left-outer interval join emits the unmatched purchase with NULL once the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[UserEvent]
    val clicks = MemoryStream[UserEvent]
    val joined = StreamOps.intervalJoin(
      purchases.toDF(), clicks.toDF(), "user_id", "2 hours",
      lateness = "10 minutes", joinType = "left_outer")
      .select(col("l.user_id").as("user_id"), col("l.ts").as("p_ts"), col("r.ts").as("c_ts"))
    val query = joined.writeStream.format("memory").queryName("louter_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: click 30 min before the purchase (inside the window);
      // user 2: purchase with NO click at all
      purchases.addData(ev("2024-01-01 10:00:00", 1, "purchase"),
        ev("2024-01-01 10:00:00", 2, "purchase"))
      clicks.addData(ev("2024-01-01 09:30:00", 1, "click"))
      query.processAllAvailable()
      // advance BOTH watermarks far past window + lateness so the engine
      // can prove user 2's purchase will never match and emit its null row
      purchases.addData(ev("2024-01-02 10:00:00", 99, "purchase"))
      clicks.addData(ev("2024-01-02 10:00:00", 99, "click"))
      query.processAllAvailable()
      val rows = spark.table("louter_out")
        .filter(col("user_id").isin(1L, 2L)).collect()
        .map(r => (r.getLong(0), r.isNullAt(2))).toSeq.sorted
      assert(rows.contains((1L, false)), s"matched purchase must pair: $rows")
      assert(rows.contains((2L, true)), s"unmatched purchase must surface with NULL click: $rows")
    } finally query.stop()
  }

  test("streaming daily HLL state converges to the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // three days of synthetic user-hours with duplicates; chunked so the
    // register state MUST merge across micro-batches (day 100 appears in
    // all three chunks, day 101 in two, day 102 in one)
    val rng = new scala.util.Random(1123)
    val all = (0 until 900).map { i =>
      val day = 100L + (i % 3 match { case 0 => 0; case 1 => i % 2; case _ => i % 3 })
      StreamOps.HllIn(day, s"${rng.nextInt(120)}:${rng.nextInt(24)}")
    }
    val chunks = all.grouped(300).toSeq

    val input = MemoryStream[StreamOps.HllIn]
    val query = StreamOps.dailyDistinctHll(input.toDS())
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      // latest snapshot per day = the one with the max cumulative n_seen
      val stream = spark.table("hll_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("day_num").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1).drop("rk")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

      val batch = StreamOps.dailyDistinctHll(all.toDS()).collect()
        .map(s => (s.day_num, (s.n_seen, s.ssum, s.n_est))).toMap

      assert(stream.keySet == batch.keySet, s"day sets differ: $stream vs $batch")
      batch.foreach { case (day, b) =>
        assert(stream(day) == b,
          s"day $day: streaming snapshot ${stream(day)} != batch face $b")
      }
    } finally query.stop()
  }

  test("streaming daily KMV state converges to the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // same chunked multi-day feed shape as the HLL test: day 100 spans all
    // chunks so the k-min state MUST merge across micro-batches; ~40
    // distinct values on day 102 keeps one day UNSATURATED (< k), proving
    // the exact-below-k branch, while day 100 saturates k=32
    val rng = new scala.util.Random(2233)
    val all = (0 until 900).map { i =>
      val day = 100L + (i % 3 match { case 0 => 0; case 1 => i % 2; case _ => i % 3 })
      // day 102 must stay UNSATURATED (< k=32 distinct): pin the hour
      // suffix so its distinct universe is exactly the 20 ids
      if (day == 102L) StreamOps.HllIn(day, s"${rng.nextInt(20)}:0")
      else StreamOps.HllIn(day, s"${rng.nextInt(400)}:${rng.nextInt(24)}")
    }
    val chunks = all.grouped(300).toSeq

    val input = MemoryStream[StreamOps.HllIn]
    val query = StreamOps.dailyDistinctKmv(input.toDS(), k = 32)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      val stream = spark.table("kmv_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("day_num").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1).drop("rk")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

      val batch = StreamOps.dailyDistinctKmv(all.toDS(), k = 32).collect()
        .map(s => (s.day_num, (s.n_seen, s.n_members, s.n_est))).toMap

      assert(stream.keySet == batch.keySet, s"day sets differ: $stream vs $batch")
      // the unsaturated day must have taken the exact branch
      assert(batch(102L)._2 < 32 && batch(102L)._2 == batch(102L)._3,
        s"day 102 should be unsaturated-exact: ${batch(102L)}")
      batch.foreach { case (day, b) =>
        assert(stream(day) == b,
          s"day $day: streaming KMV snapshot ${stream(day)} != batch face $b")
      }
    } finally query.stop()
  }

  test("streaming daily CMS counters converge to the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // skewed keys (Zipf-ish: key k with frequency ~ 1/(k+1)) across two
    // days, chunked so counters accumulate across micro-batches
    val rng = new scala.util.Random(3344)
    val all = (0 until 1200).map { i =>
      val day = 200L + (i % 2)
      val key = (math.sqrt(rng.nextInt(400)).toInt).toString
      StreamOps.CmsIn(day, key)
    }
    val chunks = all.grouped(400).toSeq

    val input = MemoryStream[StreamOps.CmsIn]
    val query = StreamOps.dailyCmsCounters(input.toDS())
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      // latest emission per cell (touched cells re-emit with higher n_seen)
      val stream = spark.table("cms_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("day_num", "i", "slot").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1), r.getLong(2)), r.getLong(3))).toMap

      val batch = StreamOps.dailyCmsCounters(all.toDS()).collect()
        .map(c => ((c.day_num, c.i, c.slot), c.cnt)).toMap

      assert(stream == batch,
        s"CMS counters diverge: stream-only=${(stream.toSet -- batch.toSet).take(5)} " +
          s"batch-only=${(batch.toSet -- stream.toSet).take(5)}")
      // CMS point estimates never undercount: probe the 3 hottest keys
      val trueCounts = all.groupBy(e => (e.day_num, e.key)).view.mapValues(_.size.toLong)
      trueCounts.toSeq.sortBy(-_._2).take(3).foreach { case ((day, key), n) =>
        val est = (0 until StreamOps.CmsDepth).map { i =>
          val slot = StreamOps.hllHash(s"cms$i:", key) >>> 55
          batch((day, i, slot))
        }.min
        assert(est >= n, s"CMS undercounted ($day,$key): est $est < true $n")
      }
    } finally query.stop()
  }

  test("streaming daily histogram state converges to the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // values spanning the range incl. out-of-range clamps on both edges,
    // two days, chunked so bin counters accumulate across micro-batches
    val rng = new scala.util.Random(4455)
    val all = (0 until 1500).map { i =>
      val day = 300L + (i % 2)
      val v = i % 50 match {
        case 0 => -3.5 // clamps to bin 0
        case 1 => 730.0 // clamps to bin 255 (odd i → day 301)
        case 3 => 5.0e9 // would CAST_OVERFLOW under ANSI without the
        // double-space clamp (the r13 review fix) — must land in bin 255;
        // odd i → day 301, keeping day 300's p99 error-bound check (the
        // bound only holds for IN-RANGE values) on in-range data
        case _ => rng.nextDouble() * 500.0
      }
      StreamOps.HistIn(day, v)
    }
    val chunks = all.grouped(500).toSeq

    val input = MemoryStream[StreamOps.HistIn]
    val query = StreamOps.dailyValueHist(input.toDS())
      .writeStream.format("memory").queryName("hist_out")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      val stream = spark.table("hist_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("day_num", "bin").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

      val batch = StreamOps.dailyValueHist(all.toDS()).collect()
        .map(c => ((c.day_num, c.bin), c.cnt)).toMap

      assert(stream == batch,
        s"histogram bins diverge: stream-only=${(stream.toSet -- batch.toSet).take(5)} " +
          s"batch-only=${(batch.toSet -- stream.toSet).take(5)}")
      // clamping landed where designed, and totals conserve
      assert(batch.keySet.exists(_._2 == 0) && batch.keySet.exists(_._2 == 255))
      assert(batch.values.sum == all.size.toLong)
      // the quantile readout's error bound: estimate within one bin width
      val day = 300L
      val vs = all.filter(_.day_num == day).map(_.v).sorted
      val cum = (0 until StreamOps.HistBins).scanLeft(0L)(
        (acc, b) => acc + batch.getOrElse((day, b), 0L)).tail
      val n = vs.size
      Seq(0.5, 0.9, 0.99).foreach { q =>
        val rank = math.ceil(q * n).toLong
        val bin = cum.indexWhere(_ >= rank)
        val estHi = (bin + 1) * StreamOps.HistBinWidth
        val exact = vs((math.ceil(q * n) - 1).toInt.max(0))
        assert(math.abs(estHi - exact) <= StreamOps.HistBinWidth * 2,
          s"q=$q: est $estHi vs exact-ish $exact")
      }
    } finally query.stop()
  }

  test("streaming quantile-sketch state converges to the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // unbounded-domain values: several octaves, exact small-value ids,
    // zero (clamps to bucket 0), and a huge outlier — no pre-bound range
    val rng = new scala.util.Random(7788)
    val all = (0 until 1500).map { i =>
      val day = 300L + (i % 2)
      val v = i % 50 match {
        case 0 => 0L
        case 1 => (1L << 52) + i // far-tail octave
        case _ => math.abs(rng.nextLong()) % 2000000L
      }
      StreamOps.QsIn(day, v)
    }
    val chunks = all.grouped(500).toSeq

    val input = MemoryStream[StreamOps.QsIn]
    val query = StreamOps.dailyQuantileSketch(input.toDS())
      .writeStream.format("memory").queryName("qsketch_out")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      val stream = spark.table("qsketch_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("day_num", "bucket").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

      val batch = StreamOps.dailyQuantileSketch(all.toDS()).collect()
        .map(c => ((c.day_num, c.bucket), c.cnt)).toMap

      assert(stream == batch,
        s"sketch buckets diverge: stream-only=${(stream.toSet -- batch.toSet).take(5)} " +
          s"batch-only=${(batch.toSet -- stream.toSet).take(5)}")
      assert(batch.values.sum == all.size.toLong) // counts conserve
      // the containment law on the streamed state: the bucket selected at
      // each quantile contains the exact order statistic
      val day = 300L
      val vs = all.filter(_.day_num == day).map(_.v).sorted
      val byBucket = batch.collect { case ((d, b), c) if d == day => b -> c }
        .toSeq.sortBy(_._1)
      Seq(0.5, 0.9, 0.99).foreach { q =>
        val rank = math.ceil(q * vs.size).toLong
        var cum = 0L
        val bucket = byBucket.find { case (_, c) => cum += c; cum >= rank }.get._1
        val exact = vs(rank.toInt - 1)
        assert(graft.functions.QuantileSketch.bucketOfJvm(exact) == bucket,
          s"q=$q: selected bucket $bucket does not contain exact $exact")
      }
    } finally query.stop()
  }

  test("armed idleTtl evicts an idle day's sketch state (fresh state after timeout)") {
    implicit val sqlCtx = spark.sqlContext
    // TTL armed => ProcessingTimeTimeout; the deployment contract requires a
    // real trigger interval, which also bounds the empty-batch cadence here
    val input = MemoryStream[StreamOps.HllIn]
    val query = StreamOps.dailyDistinctHll(input.toDS(), idleTtl = Some("1 second"))
      .writeStream.format("memory").queryName("hll_evict_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
      .start()
    try {
      // NOTE: with ProcessingTimeTimeout armed, FlatMapGroupsWithStateExec
      // reports shouldRunAnotherBatch=true after EVERY batch (a timeout can
      // fire at any wall-clock instant), so the engine never raises the
      // noNewData flag and processAllAvailable() would block forever — all
      // synchronization here polls the sink/progress with deadlines instead.
      def await(what: String)(ok: => Boolean): Unit = {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (!ok && System.nanoTime() < deadline) Thread.sleep(200)
        assert(ok, s"timed out waiting for $what")
      }
      input.addData(Seq(
        StreamOps.HllIn(300L, "a:1"), StreamOps.HllIn(300L, "b:2"),
        StreamOps.HllIn(300L, "c:3")))
      await("the n_seen=3 snapshot")(
        spark.table("hll_evict_out").filter(col("n_seen") === 3).count() == 1)
      // the timeout batch removes the idle day's registers — observable via
      // the state operator's removal counter
      def removed(): Long =
        query.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      await("idle-day state eviction")(removed() >= 1)
      // the day's state is gone: a late event restarts the sketch from zero
      input.addData(Seq(StreamOps.HllIn(300L, "z:9")))
      await("the post-eviction fresh snapshot")(
        spark.table("hll_evict_out")
          .filter(col("day_num") === 300L && col("n_seen") === 1).count() == 1)
      val nSeens = spark.table("hll_evict_out").filter(col("day_num") === 300L)
        .select("n_seen").collect().map(_.getLong(0)).toSet
      assert(!nSeens.contains(4L),
        s"state survived the TTL: cumulative n_seen=4 snapshot emitted: $nSeens")
    } finally query.stop()
  }
}
