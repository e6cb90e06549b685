package graft.streaming

import java.io.File
import graft.SparkSpec
import graft.streaming.StreamOps.{Scd2Closed, Scd2Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Deterministic fault injection for [[Scd2RestartSpec]]: local-mode tasks
  * share the JVM, so a volatile flag reaches the executor code path.
  */
object Scd2CrashFlag {
  @volatile var armed = false
}

/** The property a production CDC consumer relies on: killing the
  * flatMapGroupsWithState SCD2 query MID-BATCH and restarting it from its
  * checkpoint emits every closed version exactly once — no duplicates from
  * the replayed batch, no gaps from the aborted one.
  *
  * The crash is injected DOWNSTREAM of the state operator (a map over its
  * output), inside the same task pipeline — so when the task dies, per-key
  * state.update() calls for the batch have already run and must be rolled
  * back by the state store's abort path. Replay then re-runs the batch from
  * the SAME pre-batch state version; the file sink's manifest commits a
  * batch id at most once. Both halves (state-store transactionality, sink
  * idempotence) are what this spec pins.
  */
class Scd2RestartSpec extends SparkSpec {
  import spark.implicits._

  test("SCD2 stream restarted from a mid-batch crash emits closed versions exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scd2_restart").toFile
    val ckpt = new File(root, "ckpt").getAbsolutePath
    val outDir = new File(root, "out").getAbsolutePath

    // version chains spanning the crash batch: key 1 closes v1 in batch 1,
    // v2 (the poisoned emission) in batch 2, v3 in batch 3; key 2 closes v1
    // in batch 2 and keeps 'error' open (state-only, never in history)
    val batch1 = Seq(
      Scd2Event(1L, 10L, "view", 1000L), Scd2Event(2L, 11L, "view", 1100L),
      Scd2Event(1L, 12L, "click", 2000L))
    val batch2 = Seq(
      Scd2Event(1L, 13L, "cart", 3000L), Scd2Event(2L, 14L, "purchase", 3100L))
    val batch3 = Seq(
      Scd2Event(1L, 15L, "purchase", 5000L), Scd2Event(2L, 16L, "error", 6000L))
    val all = batch1 ++ batch2 ++ batch3

    val input = MemoryStream[Scd2Event]
    def start() = StreamOps.scd2Closed(input.toDS())
      .map { c =>
        if (Scd2CrashFlag.armed && c.user_id == 1L && c.version_seq == 2L)
          throw new RuntimeException("injected crash: batch dies after state updates ran")
        c
      }
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // ---- run 1: batch 1 commits, batch 2 crashes mid-task ----
    Scd2CrashFlag.armed = true
    val q1 = start()
    val crashed =
      try {
        input.addData(batch1: _*)
        q1.processAllAvailable()
        assert(spark.read.parquet(outDir).count() == 1, "batch 1 closes exactly key 1 v1")
        input.addData(batch2: _*) // closing (1, v2) trips the poison
        q1.processAllAvailable()
        false
      } catch { case _: Exception => true }
      finally {
        Scd2CrashFlag.armed = false
        q1.stop()
      }
    assert(crashed, "the poisoned batch must terminate the first query")

    // ---- run 2: recover from the checkpoint, replay batch 2, continue ----
    val q2 = start()
    try {
      q2.processAllAvailable() // replays the uncommitted batch 2
      input.addData(batch3: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(outDir).as[Scd2Closed].collect()
      .map(c => (c.user_id, c.version_seq, c.state, c.valid_from_sec, c.valid_to_sec))
      .toSeq.sorted
    // batch mode = whole feed in one group call = the ground-truth history
    val expected = StreamOps.scd2Closed(all.toDS()).collect()
      .map(c => (c.user_id, c.version_seq, c.state, c.valid_from_sec, c.valid_to_sec))
      .toSeq.sorted
    assert(streamed.size == streamed.distinct.size,
      s"a closed version was emitted twice across the restart: $streamed")
    assert(streamed == expected, s"streamed $streamed != batch $expected")
    // the replayed batch's versions appear exactly once by value too
    assert(streamed.count(v => v._1 == 1L && v._2 == 2L) == 1)
    assert(streamed.count(v => v._1 == 2L && v._2 == 1L) == 1)
  }
}
