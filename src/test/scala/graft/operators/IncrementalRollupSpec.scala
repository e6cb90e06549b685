package graft.operators

import graft.SparkSpec
import graft.cdc.{CdcApplier, CdcOp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup == full recompute, at every step of a CDC sequence
  * covering all delta shapes: insert into an existing group, insert creating
  * a group, value update (same count, changed sum), cross-group key moves
  * (a key UPDATEd into another group), delete shrinking a group, and delete
  * emptying a group (grain must vanish, as a recompute would drop it).
  */
class IncrementalRollupSpec extends SparkSpec {

  import spark.implicits._

  private val spec = IncrementalRollup.Spec(Seq("grp"), Seq("amount" -> col("amount")))
  private val live = col(CdcApplier.MetaDeleted) === false
  private val ts = lit("2025-01-01 00:00:00").cast("timestamp_ntz")

  private def events(rows: (String, Long, Long, Option[(String, Long)])*): DataFrame =
    rows.map { case (op, lsn, key, img) =>
      (op, lsn, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), key,
        img.map(_._1).orNull, img.map(_._2))
    }.toDF("op", "lsn", "commitTs", "key", "grp", "amount")

  private def sortedRows(df: DataFrame) =
    df.select("grp", "n", "amount").orderBy("grp").collect().map(r =>
      (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toSeq

  test("incremental maintenance equals full recompute at every batch") {
    var state = CdcApplier.snapshot(
      Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)).toDF("id", "grp", "amount"), ts)
    var rollup = IncrementalRollup.full(state.filter(live), spec)

    def applyAndCheck(evs: DataFrame): Unit = {
      val touched = evs.select(col("key").as("id")).distinct()
      val after = CdcApplier.applyBatch(state, evs, "id", ts).localCheckpoint()
      val delta = IncrementalRollup.batchDelta(state, after, touched, "id", live, spec)
      rollup = IncrementalRollup.merge(rollup, delta, spec).localCheckpoint()
      state = after
      assert(sortedRows(rollup) ==
        sortedRows(IncrementalRollup.full(state.filter(live), spec)),
        "incremental rollup diverged from full recompute")
    }

    assert(sortedRows(rollup) == Seq(("a", 2L, 15L), ("b", 1L, 7L)))
    // update value + insert into existing group + insert creating group "c"
    applyAndCheck(events(
      (CdcOp.Update, 1, 2, Some(("a", 6L))),
      (CdcOp.Insert, 2, 4, Some(("b", 3L))),
      (CdcOp.Insert, 3, 5, Some(("c", 100L)))))
    assert(sortedRows(rollup) == Seq(("a", 2L, 16L), ("b", 2L, 10L), ("c", 1L, 100L)))
    // key 1 MOVES from group a to group c (one event, two group deltas)
    applyAndCheck(events((CdcOp.Update, 4, 1, Some(("c", 10L)))))
    assert(sortedRows(rollup) == Seq(("a", 1L, 6L), ("b", 2L, 10L), ("c", 2L, 110L)))
    // deletes: shrink b, then empty it in a later batch — the grain vanishes
    applyAndCheck(events((CdcOp.Delete, 5, 3, None)))
    assert(sortedRows(rollup) == Seq(("a", 1L, 6L), ("b", 1L, 3L), ("c", 2L, 110L)))
    applyAndCheck(events((CdcOp.Delete, 6, 4, None)))
    assert(sortedRows(rollup) == Seq(("a", 1L, 6L), ("c", 2L, 110L)))
    // latest-wins inside one batch: the collapsed image is what lands
    applyAndCheck(events(
      (CdcOp.Update, 7, 5, Some(("c", 1L))),
      (CdcOp.Update, 8, 5, Some(("a", 2L)))))
    assert(sortedRows(rollup) == Seq(("a", 2L, 8L), ("c", 1L, 10L)))
  }

  test("rollup maintenance runs inside a streaming foreachBatch micro-batch loop") {
    import graft.cdc.{CdcEvent, CdcOp, CdcPipeline}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("amount", LongType)))
    val tstamp = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val feedDir = java.nio.file.Files.createTempDirectory("rollup-feed").toString
    spark.createDataset(Seq(
      CdcEvent("t", CdcOp.Insert, 1, tstamp, 4, Map("grp" -> "b", "amount" -> "3")),
      CdcEvent("t", CdcOp.Update, 2, tstamp, 2, Map("grp" -> "a", "amount" -> "6")),
      CdcEvent("t", CdcOp.Delete, 3, tstamp, 3, Map.empty)))
      .write.mode("overwrite").json(feedDir)

    var state = CdcApplier.snapshot(
      Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)).toDF("id", "grp", "amount"), ts)
    var rollup = IncrementalRollup.full(state.filter(live), spec)
    val q = CdcPipeline.fileEventStream(spark, feedDir).writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rollup-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CdcEvent], _: Long) =>
        val typed = batch.toDF().select(
          Seq(col("op"), col("lsn"), col("commitTs"), col("key")) ++
            CdcApplier.afterImageColumns(schema, "id"): _*)
        val touched = typed.select(col("key").as("id")).distinct()
        val after = CdcApplier.applyBatch(state, typed, "id", ts).localCheckpoint()
        rollup = IncrementalRollup.merge(rollup,
          IncrementalRollup.batchDelta(state, after, touched, "id", live, spec),
          spec).localCheckpoint()
        state = after
        ()
      }.start()
    q.awaitTermination(120000)
    assert(sortedRows(rollup) ==
      sortedRows(IncrementalRollup.full(state.filter(live), spec)))
    assert(sortedRows(rollup) == Seq(("a", 2L, 16L), ("b", 1L, 3L)))
  }
}
