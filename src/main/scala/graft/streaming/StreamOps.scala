package graft.streaming

import java.sql.Timestamp
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms over an event stream (the Structured Streaming face
  * of the engine, complementing the CDC applier of [[graft.cdc]]).
  *
  * All operators work identically on batch and streaming DataFrames — the
  * declarative `window`/`session_window` functions are Catalyst expressions,
  * so the SAME function is oracle-checkable in batch mode and deployable
  * with `readStream` + watermark at scale. State size is bounded by the
  * watermark; keys partition the state store, so state scales horizontally
  * with executors.
  */
object StreamOps {

  /** Tumbling-window counts per event type. With a watermark, late data
    * beyond `lateness` is dropped and window state is evicted — the knob
    * that keeps state bounded on an unbounded stream.
    */
  def tumblingCounts(events: DataFrame, width: String, lateness: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    // streaming state stores can't hold exact distinct sets → HLL sketch on
    // the stream, exact count in batch (where the DuckDB oracle checks it)
    val distinctUsers =
      if (events.isStreaming) approx_count_distinct(col("user_id"))
      else countDistinct(col("user_id"))
    withWm
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        distinctUsers.as("n_users"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("n_users"))
  }

  /** Sliding-window event rates (width/slide), e.g. 10-minute windows every
    * 5 minutes. Each event lands in width/slide windows; Spark expands this
    * map-side — no self-join.
    */
  def slidingCounts(events: DataFrame, width: String, slide: String,
      lateness: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"), col("n_events"))
  }

  /** Session windows per user: a session closes after `gap` of inactivity.
    * Built-in `session_window` keeps this fully declarative (state merging,
    * watermark eviction for free).
    */
  def userSessions(events: DataFrame, gap: String, lateness: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("session_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("session_value"))
  }

  /** Streaming ingest dedup: drop documents whose content digest was already
    * seen, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark`) — the streaming face of
    * [[graft.pipeline.TextPipelineQueries]]'s exact dedup. Duplicates of a
    * row arriving within `lateness` of it are dropped even across
    * micro-batches; digest state older than the watermark is evicted, so
    * state size tracks the dedup horizon, not the stream's lifetime.
    *
    * Survivor policy: the stream keeps the FIRST ARRIVAL per digest (the
    * only choice bounded state allows). Batch mode keeps the earliest
    * (`tsCol`, `idCol`) row — a deterministic analogue of arrival order;
    * plain dropDuplicates would keep whichever row a task emitted first
    * and change across runs/partitionings.
    */
  def dedupByDigest(docs: DataFrame, tsCol: String, contentCol: String,
      idCol: String, lateness: String = "10 minutes"): DataFrame = {
    val withDigest = docs.withColumn("_digest", md5(col(contentCol)))
    val out =
      if (docs.isStreaming)
        withDigest.withWatermark(tsCol, lateness)
          .dropDuplicatesWithinWatermark("_digest")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_digest").orderBy(col(tsCol), col(idCol))
        withDigest
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn")
      }
    out.drop("_digest")
  }

  /** Stream-stream interval join: pair each left event with right-side
    * events of the same key from the preceding `lookback` (inclusive of the
    * left timestamp) — the attribution shape (purchase ← recent clicks).
    *
    * In streaming mode both sides carry watermarks and the range predicate
    * is what lets Spark bound the join state: right-side rows older than
    * watermark + lookback can never match a future left row and are
    * evicted, so state tracks the lookback horizon, not the stream's
    * lifetime. In batch mode the identical condition plans as a keyed
    * equi-join with a range filter — state partitioned by key either way,
    * scaling horizontally with executors.
    *
    * Output columns keep their side prefixes (`l.*` / `r.*`); callers
    * project/rename.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lookback: String, lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", lateness) else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark("ts", lateness) else right).alias("r")
    // "left_outer" is the attribution-with-nulls variant: a left event with
    // no in-window match is still emitted (click-less purchase). In
    // streaming mode Spark requires exactly what this join already has —
    // watermarks on BOTH sides plus the event-time range in the
    // condition — because the null row for an unmatched left event can only
    // be emitted once the watermark proves no matching right event can
    // still arrive; the same watermark bounds the join state.
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL '$lookback'") &&
        col("r.ts") <= col("l.ts"),
      joinType)
  }

  // ----- incremental SCD Type 2 maintenance -----

  case class Scd2Event(user_id: Long, event_id: Long, event_type: String, ts_sec: Long)
  case class Scd2Open(state: String, validFrom: Long, versionSeq: Long)
  case class Scd2Closed(user_id: Long, version_seq: Long, state: String,
      valid_from_sec: Long, valid_to_sec: Long)

  /** Incrementally maintain an SCD Type 2 history from a change feed: each
    * arriving event closes the key's open version (emitted downstream,
    * append-only — each closed version exactly once) and becomes the new
    * open version, held in per-key state. The open version lives in O(1)
    * state per key — the serving table holds it; the history sink only ever
    * receives immutable closed rows. This is the streaming counterpart of
    * the batch window in [[graft.analytics.CdcShapeQueries]] q_cdc_scd2:
    * in batch mode each group sees all its events at once and the output
    * is exactly the closed-version set of the batch query.
    *
    * Feed contract (same as the CDC applier's): per-key arrival order
    * respects (ts_sec, event_id) across micro-batches — a CDC feed is
    * LSN-ordered per key. Within a batch events are sorted explicitly; an
    * out-of-contract late event (older than the open version) is dropped
    * rather than rewriting already-emitted history.
    */
  def scd2Closed(events: Dataset[Scd2Event]): Dataset[Scd2Closed] = {
    implicit val stateEnc: Encoder[Scd2Open] = Encoders.product[Scd2Open]
    implicit val outEnc: Encoder[Scd2Closed] = Encoders.product[Scd2Closed]
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[Scd2Event], st: GroupState[Scd2Open]) => {
          val sorted = batch.toArray.sortBy(e => (e.ts_sec, e.event_id))
          var open = st.getOption
          val out = Seq.newBuilder[Scd2Closed]
          sorted.foreach { e =>
            open match {
              case Some(o) if e.ts_sec >= o.validFrom =>
                out += Scd2Closed(userId, o.versionSeq, o.state, o.validFrom, e.ts_sec)
                open = Some(Scd2Open(e.event_type, e.ts_sec, o.versionSeq + 1))
              case None =>
                open = Some(Scd2Open(e.event_type, e.ts_sec, 1L))
              case Some(_) => () // late beyond the open version: dropped
            }
          }
          open.foreach(st.update)
          out.result().iterator
        })
  }

  // ----- per-key quota enforcement (rate limiting) -----

  case class QuotaEvent(user_id: Long, day_num: Long, event_id: Long, ts_sec: Long)
  case class QuotaCount(nSeen: Long)
  case class QuotaTagged(user_id: Long, day_num: Long, event_id: Long,
      ts_sec: Long, accepted: Boolean)

  /** Per-(key, day) ingestion quota: the first `cap` events of a key's day
    * are accepted, the rest tagged rejected — the per-source/per-tenant
    * rate-limit gate of an ingestion pipeline (events are never DROPPED
    * here; the rejected channel is preserved for audit, callers filter).
    *
    * Batch face: deterministic arrival order = (ts_sec, event_id) per key,
    * so acceptance is a row_number ≤ cap under the key window — replayable
    * and oracle-checkable. Streaming face: a per-key running count in
    * `flatMapGroupsWithState` tags events in arrival order (each
    * micro-batch sorted the same way, so an in-order feed reproduces the
    * batch tagging exactly); the day in the key means an idle key's state
    * is one counter per active day — in production a timeout evicts
    * yesterday's counters, keeping state proportional to ACTIVE keys, not
    * lifetime keys.
    */
  def rateLimit(events: Dataset[QuotaEvent], cap: Int): Dataset[QuotaTagged] = {
    implicit val stateEnc: Encoder[QuotaCount] = Encoders.product[QuotaCount]
    implicit val outEnc: Encoder[QuotaTagged] = Encoders.product[QuotaTagged]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events
        .groupByKey(e => (e.user_id, e.day_num))
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
          (key: (Long, Long), batch: Iterator[QuotaEvent], st: GroupState[QuotaCount]) => {
            var seen = st.getOption.map(_.nSeen).getOrElse(0L)
            val out = batch.toArray.sortBy(e => (e.ts_sec, e.event_id)).map { e =>
              seen += 1
              QuotaTagged(e.user_id, e.day_num, e.event_id, e.ts_sec, seen <= cap)
            }
            st.update(QuotaCount(seen))
            out.iterator
          })
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "day_num").orderBy("ts_sec", "event_id")
      events.toDF()
        .withColumn("accepted", row_number().over(w) <= cap)
        .as[QuotaTagged]
    }
  }

  // ----- streaming distinct sketch: mergeable per-day HLL registers -----

  case class HllIn(day_num: Long, uh: String)
  case class HllRegs(regs: Array[Int], nSeen: Long)
  case class HllSnap(day_num: Long, n_seen: Long, ssum: Long, n_est: Long)

  /** Per-day distinct-count HLL maintained ACROSS micro-batches: the state
    * is the m=128 register array — 128 ints per active day, merged with
    * each batch's contribution by register max (the same merge law the
    * rolling-HLL batch face decomposes over; see q_distinct_rolling_hll).
    * Each micro-batch emits an updated snapshot per touched key carrying
    * the cumulative event count `n_seen`, so a consumer (and the
    * equivalence spec) identifies the latest snapshot without relying on
    * sink ordering. This is the sketch-as-STATE face the batch aggregates
    * lack: at 100 TB/day the per-day register set never grows with the
    * corpus, an idle day's state is 512 bytes, and the emitted estimate is
    * serving-ready after every trigger.
    *
    * Idle-day retention: pass `idleTtl = Some("48 hours")` to arm a
    * ProcessingTimeTimeout that drops a day's registers once it has gone
    * untouched that long (the day's last-emitted snapshot downstream stays
    * the final answer — eviction only forgets state a closed day will
    * never update again). The default is `None` = keep state until the
    * query ends, because an armed processing-time timeout makes the
    * micro-batch engine schedule a batch after EVERY trigger to evaluate
    * deadlines — correct under a production 60 s trigger (one empty batch
    * per minute), but a tight empty-batch spin under the default 0 ms
    * trigger. Deployments that arm the TTL must also set a real trigger
    * interval; StreamOpsSpec's eviction test does exactly that.
    *
    * Hashing and estimate arithmetic are IDENTICAL to the batch face
    * (native [[org.apache.spark.sql.graft.Md5Util]] hi64 → bucket/rho
    * shifts, raw-HLL integer estimate (11719·2³³)//ssum), so the final
    * streaming snapshot per day equals the batch face row for row —
    * StreamOpsSpec drives both over a multi-chunk feed and asserts
    * exactly that, q_rate_limit-style.
    */
  def dailyDistinctHll(events: Dataset[HllIn], prefix: String = "sdh:",
      idleTtl: Option[String] = None): Dataset[HllSnap] = {
    val m = 128
    val estNumerator = 11719L * (1L << 33) // alpha_128 · m² · 2³³, pre-folded
    implicit val stateEnc: Encoder[HllRegs] = Encoders.product[HllRegs]
    implicit val outEnc: Encoder[HllSnap] = Encoders.product[HllSnap]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events
        .groupByKey(_.day_num)
        .flatMapGroupsWithState(OutputMode.Update(), timeoutConf(idleTtl))(
          (day: Long, batch: Iterator[HllIn], st: GroupState[HllRegs]) => {
            if (st.hasTimedOut) {
              // idle-day eviction: the day's last snapshot already left the
              // operator; dropping registers emits nothing new
              st.remove()
              Iterator.empty
            } else {
              val prev = st.getOption.getOrElse(HllRegs(new Array[Int](m), 0L))
              val regs = prev.regs.clone() // never mutate the store's object
              var nSeen = prev.nSeen
              batch.foreach { e =>
                val h = graft.streaming.StreamOps.hllHash(prefix, e.uh)
                val bucket = (h >>> 56).toInt % m
                val hv = (h >>> 24) & 0xFFFFFFFFL
                val rho = if (hv == 0L) 33 else java.lang.Long.numberOfLeadingZeros(hv) - 31
                if (rho > regs(bucket)) regs(bucket) = rho
                nSeen += 1
              }
              st.update(HllRegs(regs, nSeen))
              idleTtl.foreach(st.setTimeoutDuration)
              var ssum = 0L
              var i = 0
              while (i < m) { ssum += 1L << (33 - regs(i)); i += 1 }
              Iterator.single(HllSnap(day, nSeen, ssum, estNumerator / ssum))
            }
          })
    else {
      import org.apache.spark.sql.graft.SketchExpressions
      val h = events.toDF()
        .select(col("day_num"),
          SketchExpressions.md5Hi64(concat(lit(prefix), col("uh"))).as("h8"))
        .select(col("day_num"),
          expr(s"shiftrightunsigned(h8, 56) % $m").as("bucket"),
          expr("shiftrightunsigned(h8, 24) & 4294967295").as("hv"))
      val rho = h.groupBy("day_num", "bucket")
        .agg(max(SketchExpressions.hllRho32(col("hv"))).as("r"),
          count(lit(1)).as("n_part"))
        .stableCheckpoint() // eager: days×≤128 rows; feeds grid + counts
      val counts = rho.groupBy("day_num").agg(sum("n_part").as("n_seen"))
      val grid = rho.select("day_num").distinct()
        .select(col("day_num"), explode(expr(s"sequence(0, ${m - 1})")).as("b"))
        .select(col("day_num"), col("b").cast("long").as("bucket"))
      val est = grid.join(rho.select("day_num", "bucket", "r"), Seq("day_num", "bucket"), "left")
        .select(col("day_num"), coalesce(col("r"), lit(0)).as("r"))
        .groupBy("day_num")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - r)")).as("ssum"))
        .select(col("day_num"),
          expr(s"$estNumerator DIV ssum").as("n_est"), col("ssum"))
      counts.join(est, "day_num")
        .select(col("day_num"), col("n_seen"), col("ssum"), col("n_est"))
        .as[HllSnap]
    }
  }

  /** Driver/executor-side hash shared by the streaming state function —
    * same digest+fold as the native expression ([[org.apache.spark.sql.graft.Md5Util]]).
    */
  def hllHash(prefix: String, v: String): Long =
    org.apache.spark.sql.graft.Md5Util.hi64((prefix + v).getBytes("UTF-8"))

  /** Timeout mode for the sketch-state operators: a TTL arms
    * ProcessingTimeTimeout (deployment must pair it with a real trigger
    * interval — see [[dailyDistinctHll]]'s retention note); None keeps
    * NoTimeout so the micro-batch engine never schedules timeout-evaluation
    * batches.
    */
  private def timeoutConf(idleTtl: Option[String]): GroupStateTimeout =
    if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  // ----- streaming KMV sketch state: per-day distinct via k-min hashes -----

  case class KmvState(mins: Array[Long], nSeen: Long)
  case class KmvSnap(day_num: Long, n_seen: Long, n_members: Long, n_est: Long)

  /** Per-day distinct-count KMV sketch maintained across micro-batches —
    * the intersection-capable sibling of [[dailyDistinctHll]] (same state
    * pattern, different merge law: k smallest distinct hashes instead of
    * register max; Bar-Yossef et al. 2002). State per active day is ≤ k
    * longs (2 KiB at k=256) regardless of volume; the merge (union → keep
    * k smallest) is associative and commutative, so the final snapshot is
    * batch-split-invariant — StreamOpsSpec proves the streaming face equals
    * this batch face row for row over a chunked feed. Estimate contract
    * (shared with q_distinct_kmv_intersect): an unsaturated sketch IS its
    * set (exact); saturated, (k−1)·2⁴⁸ // h_k — both branches
    * integer-exact in DuckDB. Idle-day retention follows
    * [[dailyDistinctHll]]'s `idleTtl` contract (opt-in TTL eviction;
    * arming it requires a real trigger interval).
    *
    * Batch face scale shape: a bounded k-min aggregate
    * ([[graft.functions.KMinAgg]]) whose every partial buffer holds ≤ k
    * longs — map-side combinable, one shuffle, never a full per-day sort,
    * and never more than k values in executor memory per group at any
    * moment of the aggregation.
    */
  def dailyDistinctKmv(events: Dataset[HllIn], k: Int = 256,
      prefix: String = "sdk:", idleTtl: Option[String] = None): Dataset[KmvSnap] = {
    val kNumerator = (k - 1).toLong << 48 // (k−1)·2⁴⁸, the KMV estimator
    implicit val stateEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[KmvSnap] = Encoders.product[KmvSnap]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events
        .groupByKey(_.day_num)
        .flatMapGroupsWithState(OutputMode.Update(), timeoutConf(idleTtl))(
          (day: Long, batch: Iterator[HllIn], st: GroupState[KmvState]) => {
            if (st.hasTimedOut) { st.remove(); Iterator.empty }
            else {
              val prev = st.getOption.getOrElse(KmvState(Array.empty[Long], 0L))
              var nSeen = prev.nSeen
              val set = scala.collection.mutable.TreeSet.empty[Long]
              prev.mins.foreach(set += _)
              batch.foreach { e =>
                nSeen += 1
                set += (graft.streaming.StreamOps.hllHash(prefix, e.uh) >>> 16)
                if (set.size > k) set -= set.last // keep the k smallest
              }
              val mins = set.toArray // TreeSet iterates ascending
              st.update(KmvState(mins, nSeen))
              idleTtl.foreach(st.setTimeoutDuration)
              val est =
                if (mins.length < k) mins.length.toLong
                else kNumerator / mins.last
              Iterator.single(KmvSnap(day, nSeen, mins.length.toLong, est))
            }
          })
    else {
      import org.apache.spark.sql.graft.SketchExpressions
      val h = events.toDF()
        .select(col("day_num"),
          SketchExpressions.md5Hi64(concat(lit(prefix), col("uh"))).as("h8"))
        .select(col("day_num"), expr("shiftrightunsigned(h8, 16)").as("hv"))
      val counts = h.groupBy("day_num").agg(count(lit(1)).as("n_seen"))
      // bounded k-min aggregate: every partial buffer holds ≤ k longs no
      // matter the day's distinct volume (the r12 advice fix — the prior
      // collect_set+slice shape buffered the FULL distinct set per salt
      // group before slicing), and one level replaces the old
      // salt+window two-phase: map-side partials are already ≤ k.
      // null hv (null uh) must be SKIPPED like the old collect_set did —
      // the primitive-Long aggregator input cannot carry nulls
      val agg = h.filter(col("hv").isNotNull).groupBy("day_num")
        .agg(graft.functions.KMinAgg.kmin(col("hv"), k).as("mins"))
        .select(col("day_num"), size(col("mins")).cast("long").as("n_members"),
          element_at(col("mins"), -1).as("kth"))
        .select(col("day_num"), col("n_members"),
          when(col("n_members") < k, col("n_members"))
            .otherwise(expr(s"CAST($kNumerator DIV kth AS BIGINT)")).as("n_est"))
      counts.join(agg, "day_num")
        .select(col("day_num"), col("n_seen"), col("n_members"), col("n_est"))
        .as[KmvSnap]
    }
  }

  // ----- streaming CMS state: per-day heavy-hitter counters -----

  case class CmsIn(day_num: Long, key: String)
  case class CmsState(counters: Array[Long], nSeen: Long)
  case class CmsCell(day_num: Long, i: Int, slot: Long, cnt: Long, n_seen: Long)

  val CmsDepth = 4
  val CmsWidth = 512 // 9 bits of the md5 hi-64 per row

  /** Per-day count-min-sketch counters maintained across micro-batches
    * (Cormode & Muthukrishnan 2005): depth 4 × width 512 longs = 16 KiB
    * per active day at ANY event volume; counters are purely additive, so
    * the streaming merge is `+=` and the final state equals the batch
    * face's (day, row, slot) counter rows exactly — order- and
    * batch-split-invariant (StreamOpsSpec). A consumer estimates any key's
    * daily count as min_i counters[i][h_i(key)] — the gated
    * q_stream_heavy_cms does exactly that for the day's candidates and
    * takes the top heavy hitters; at 100 TB the candidate set comes from
    * the bounded entity dimension (or a tracked top-K heap), never from
    * re-scanning events. Row hashes are the same native md5-hi64 chain as
    * every other sketch here ("cms<i>:" domains), so DuckDB re-derives the
    * counters bit-identically. Output rows carry the day's cumulative
    * `n_seen` so the latest snapshot per cell is self-identifying; only
    * touched cells are re-emitted each trigger. Idle-day state evicts
    * follows [[dailyDistinctHll]]'s `idleTtl` contract (opt-in TTL
    * eviction; arming it requires a real trigger interval).
    */
  def dailyCmsCounters(events: Dataset[CmsIn],
      idleTtl: Option[String] = None): Dataset[CmsCell] = {
    implicit val stateEnc: Encoder[CmsState] = Encoders.product[CmsState]
    implicit val outEnc: Encoder[CmsCell] = Encoders.product[CmsCell]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events
        .groupByKey(_.day_num)
        .flatMapGroupsWithState(OutputMode.Update(), timeoutConf(idleTtl))(
          (day: Long, batch: Iterator[CmsIn], st: GroupState[CmsState]) => {
            if (st.hasTimedOut) { st.remove(); Iterator.empty }
            else {
              val prev = st.getOption.getOrElse(
                CmsState(new Array[Long](CmsDepth * CmsWidth), 0L))
              val counters = prev.counters.clone()
              var nSeen = prev.nSeen
              val touched = scala.collection.mutable.LinkedHashSet.empty[Int]
              batch.foreach { e =>
                nSeen += 1
                var i = 0
                while (i < CmsDepth) {
                  val slot = (graft.streaming.StreamOps.hllHash(s"cms$i:", e.key) >>> 55).toInt
                  val idx = i * CmsWidth + slot
                  counters(idx) += 1
                  touched += idx
                  i += 1
                }
              }
              st.update(CmsState(counters, nSeen))
              idleTtl.foreach(st.setTimeoutDuration)
              touched.iterator.map(idx =>
                CmsCell(day, idx / CmsWidth, (idx % CmsWidth).toLong, counters(idx), nSeen))
            }
          })
    else {
      import org.apache.spark.sql.graft.SketchExpressions
      val hashed = events.toDF().select(
        Seq(col("day_num")) ++ (0 until CmsDepth).map { i =>
          SketchExpressions.md5Hi64(concat(lit(s"cms$i:"), col("key"))).as(s"h$i")
        }: _*)
      val expanded = hashed.select(col("day_num"),
          explode(array((0 until CmsDepth).map { i =>
            struct(lit(i).as("i"), expr(s"shiftrightunsigned(h$i, 55)").as("slot"))
          }: _*)).as("c"))
        .select(col("day_num"), col("c.i").as("i"), col("c.slot").as("slot"))
      val nSeen = events.toDF().groupBy("day_num").agg(count(lit(1)).as("n_seen"))
      expanded.groupBy("day_num", "i", "slot").agg(count(lit(1)).as("cnt"))
        .join(nSeen, "day_num")
        .select(col("day_num"), col("i"), col("slot"), col("cnt"), col("n_seen"))
        .as[CmsCell]
    }
  }

  // ----- streaming histogram state: per-day value-distribution bins -----

  case class HistIn(day_num: Long, v: Double)
  case class HistState(counters: Array[Long], nSeen: Long)
  case class HistCell(day_num: Long, bin: Int, cnt: Long, n_seen: Long)

  val HistBins = 256
  /** Fixed bin width 2.0 over [0, 512): exactly representable, so
    * `floor(v / 2)` is the same deterministic double op in Spark and
    * DuckDB. Out-of-range values clamp to the edge bins.
    */
  val HistBinWidth = 2.0

  /** The shared bin function, column form (the state function applies the
    * identical arithmetic executor-side). Clamped in DOUBLE space BEFORE
    * the int cast: under ANSI a huge value would otherwise throw
    * CAST_OVERFLOW at `.cast("int")` instead of clamping to the edge bin
    * as the contract promises. NaN clamps to the top bin (Spark's
    * least/greatest order NaN greatest — matched executor-side).
    */
  def histBin(v: Column): Column =
    least(lit((HistBins - 1).toDouble),
      greatest(lit(0.0), floor(v / HistBinWidth))).cast("int")

  /** The executor-side twin of [[histBin]]: NaN → top bin, matching the
    * column face's least/greatest NaN ordering (java Math.min/max would
    * propagate NaN → 0).
    */
  private[streaming] def histBinJvm(v: Double): Int = {
    val f = math.floor(v / HistBinWidth)
    if (f.isNaN || f >= HistBins - 1) HistBins - 1
    else if (f <= 0.0) 0
    else f.toInt
  }

  /** The shared streaming skeleton of every per-day ADDITIVE-counter
    * sketch state ([[dailyValueHist]], [[dailyQuantileSketch]]): a
    * fixed-size counter array per day, `+=` merge (order- and
    * batch-split-invariant), touched-cells-only emission, idleTtl
    * eviction per [[dailyDistinctHll]]'s contract. Emits raw
    * (day, bucket, count, n_seen) tuples; each face maps them onto its
    * cell type.
    */
  private def dailyCounterState[I](events: Dataset[I], numBuckets: Int,
      key: I => Long, bucket: I => Int, idleTtl: Option[String])
      : Dataset[(Long, Int, Long, Long)] = {
    implicit val stateEnc: Encoder[HistState] = Encoders.product[HistState]
    implicit val outEnc: Encoder[(Long, Int, Long, Long)] =
      Encoders.product[(Long, Int, Long, Long)]
    import events.sparkSession.implicits._
    events
      .groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf(idleTtl))(
        (day: Long, batch: Iterator[I], st: GroupState[HistState]) => {
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val prev = st.getOption.getOrElse(
              HistState(new Array[Long](numBuckets), 0L))
            val counters = prev.counters.clone()
            var nSeen = prev.nSeen
            val touched = scala.collection.mutable.LinkedHashSet.empty[Int]
            batch.foreach { e =>
              nSeen += 1
              val b = bucket(e)
              counters(b) += 1
              touched += b
            }
            st.update(HistState(counters, nSeen))
            idleTtl.foreach(st.setTimeoutDuration)
            touched.iterator.map(b => (day, b, counters(b), nSeen))
          }
        })
  }

  /** Per-day fixed-bin value histogram maintained across micro-batches —
    * the value-DISTRIBUTION sibling of the distinct (HLL/KMV) and
    * frequency (CMS) state faces: 256 additive bin counters = 2 KiB per
    * active day at ANY event volume. Counters are purely additive, so the
    * merge is `+=`, the final state is order- and batch-split-invariant,
    * and the streaming snapshot equals the batch face's (day, bin) rows
    * exactly (StreamOpsSpec). A consumer reads quantiles from the
    * cumulative bins with error ≤ one bin width — the gated
    * q_stream_quantile_hist does exactly that against the exact per-day
    * percentile. Idle-day eviction follows [[dailyDistinctHll]]'s
    * `idleTtl` contract.
    */
  def dailyValueHist(events: Dataset[HistIn],
      idleTtl: Option[String] = None): Dataset[HistCell] = {
    implicit val outEnc: Encoder[HistCell] = Encoders.product[HistCell]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      dailyCounterState[HistIn](events, HistBins, _.day_num,
          e => histBinJvm(e.v), idleTtl)
        .map { case (d, b, c, n) => HistCell(d, b, c, n) }
    else {
      val nSeen = events.toDF().groupBy("day_num").agg(count(lit(1)).as("n_seen"))
      events.toDF()
        .select(col("day_num"), histBin(col("v")).as("bin"))
        .groupBy("day_num", "bin").agg(count(lit(1)).as("cnt"))
        .join(nSeen, "day_num")
        .select(col("day_num"), col("bin"), col("cnt"), col("n_seen"))
        .as[HistCell]
    }
  }

  // ----- streaming quantile-sketch state: unbounded-domain quantiles -----

  case class QsIn(day_num: Long, v: Long)
  case class QsCell(day_num: Long, bucket: Int, cnt: Long, n_seen: Long)

  /** Per-day HDR-style quantile sketch maintained across micro-batches —
    * the UNBOUNDED-domain sibling of [[dailyValueHist]] (r13 verdict
    * item 2): [[graft.functions.QuantileSketch]]'s exponent/mantissa
    * bucketing covers every non-negative long with ≤ 1888 additive
    * counters (≤ 15 KiB per active day at any volume and any value
    * range), relative value error ≤ 2^−5. Counters are purely additive,
    * so the state is batch-split/order-invariant and the streaming
    * snapshot equals the batch face exactly (StreamOpsSpec); quantile
    * readout cumulates ascending bucket ids (the gated
    * q_stream_quantile_sketch). Idle-day eviction follows
    * [[dailyDistinctHll]]'s `idleTtl` contract.
    */
  def dailyQuantileSketch(events: Dataset[QsIn],
      idleTtl: Option[String] = None): Dataset[QsCell] = {
    import graft.functions.QuantileSketch
    implicit val outEnc: Encoder[QsCell] = Encoders.product[QsCell]
    import events.sparkSession.implicits._
    if (events.isStreaming)
      dailyCounterState[QsIn](events, QuantileSketch.NumBuckets, _.day_num,
          e => QuantileSketch.bucketOfJvm(e.v), // == column face, spec-proven
          idleTtl)
        .map { case (d, b, c, n) => QsCell(d, b, c, n) }
    else {
      val nSeen = events.toDF().groupBy("day_num").agg(count(lit(1)).as("n_seen"))
      events.toDF()
        .select(col("day_num"),
          QuantileSketch.bucketOf(col("v")).cast("int").as("bucket"))
        .groupBy("day_num", "bucket").agg(count(lit(1)).as("cnt"))
        .join(nSeen, "day_num")
        .select(col("day_num"), col("bucket"), col("cnt"), col("n_seen"))
        .as[QsCell]
    }
  }

  /** Stream-static enrichment: the unbounded event stream joined to a
    * bounded dimension table, then window-aggregated per dimension
    * attribute. The static side is explicitly `broadcast` — a stream-static
    * join must NEVER shuffle the stream on the join key (that would
    * re-key every micro-batch); with the dim broadcast, enrichment is
    * map-side and the only stateful stage is the windowed aggregate, whose
    * state the watermark bounds. At 100 TB/day the dim is the thing that
    * fits in memory (customers), the stream is the thing that doesn't —
    * exactly the CDC-maintained-table × event-stream join the reference's
    * pipeline feeds (sql/4.analytics_queries.sql joins the replicated
    * dimension tables the same way).
    */
  def enrichedSegmentWindows(events: DataFrame, dim: DataFrame, width: String,
      lateness: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), width).as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("seg_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("c_mktsegment"), col("n_events"), col("seg_value"))
  }

  // ----- custom state: running per-user aggregates with anomaly flags -----

  case class UserEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class UserRunningState(nEvents: Long, totalValue: Double)
  case class UserUpdate(user_id: Long, nEvents: Long, totalValue: Double, anomalous: Boolean)

  /** Per-key custom state via flatMapGroupsWithState — the escape hatch for
    * semantics the declarative windows can't express (here: a running
    * lifetime total with an anomaly flag once a user's cumulative value
    * crosses a threshold). State is per-key and checkpointed; timeouts would
    * evict idle users in production.
    */
  def runningUserTotals(events: Dataset[UserEvent], anomalyThreshold: Double): Dataset[UserUpdate] = {
    implicit val stateEnc: Encoder[UserRunningState] = Encoders.product[UserRunningState]
    implicit val outEnc: Encoder[UserUpdate] = Encoders.product[UserUpdate]
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunningState]) => {
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.nEvents
          var total = prev.totalValue
          batch.foreach { e => n += 1; total += e.value }
          state.update(UserRunningState(n, total))
          Iterator.single(UserUpdate(userId, n, total, total > anomalyThreshold))
        })
  }
}
