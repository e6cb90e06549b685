package graft.cdc

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-kernel semantics (reference T2/T3/T4/T6) + convergence properties
  * (SURVEY §5.4): latest-wins per key, soft delete, metadata stamping,
  * idempotent retry, batch-split invariance.
  */
class CdcApplierSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("val", StringType)))

  private def destOf(rows: Seq[(Long, String)]): DataFrame =
    CdcApplier.snapshot(rows.toDF("id", "val"), lit("2025-01-01 00:00:00").cast("timestamp"))

  private def eventsOf(evs: Seq[(String, Long, Long, String)]): DataFrame =
    // (op, lsn, key, val)
    evs.map { case (op, lsn, k, v) =>
      (op, lsn, Timestamp.valueOf("2025-01-02 00:00:00"), k, Option(v))
    }.toDF("op", "lsn", "commitTs", "key", "val")

  private def apply1(dest: DataFrame, evs: Seq[(String, Long, Long, String)]): DataFrame =
    CdcApplier.applyBatch(dest, eventsOf(evs), "id",
      lit("2025-01-02 12:00:00").cast("timestamp"))

  private def state(df: DataFrame): Map[Long, (String, Boolean, Boolean)] =
    df.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[String]("val"),
        r.getAs[Boolean](CdcApplier.MetaDeleted),
        r.getAs[Any](CdcApplier.MetaUpdated) != null))).toMap

  test("INSERT adds a row with inserted_at stamped, updated_at null") {
    val out = apply1(destOf(Seq(1L -> "a")), Seq(("INSERT", 10L, 2L, "b")))
    val s = state(out)
    assert(s(2L) == (("b", false, false)))
    assert(s(1L) == (("a", false, false)))
  }

  test("UPDATE replaces values and stamps updated_at; untouched rows keep null") {
    val out = apply1(destOf(Seq(1L -> "a", 2L -> "b")), Seq(("UPDATE", 10L, 1L, "a2")))
    val s = state(out)
    assert(s(1L) == (("a2", false, true)))
    assert(s(2L) == (("b", false, false)))
  }

  test("DELETE soft-deletes: row kept, flag true, updated_at stamped") {
    val out = apply1(destOf(Seq(1L -> "a")), Seq(("DELETE", 10L, 1L, null)))
    val s = state(out)
    assert(s(1L)._2 === true)
    assert(s(1L)._1 == "a") // last image retained
    assert(out.count() == 1)
  }

  test("latest-wins collapses insert+update+delete chains within a batch") {
    val out = apply1(destOf(Seq.empty), Seq(
      ("INSERT", 1L, 5L, "v1"),
      ("UPDATE", 2L, 5L, "v2"),
      ("UPDATE", 3L, 5L, "v3")))
    assert(state(out)(5L)._1 == "v3")
    // and a delete at the end wins
    val out2 = apply1(destOf(Seq.empty), Seq(
      ("INSERT", 1L, 6L, "x"),
      ("DELETE", 2L, 6L, null)))
    assert(state(out2)(6L)._2 === true)
  }

  test("re-applying the same batch is a no-op (idempotent retry)") {
    val b = Seq(("UPDATE", 10L, 1L, "a2"), ("INSERT", 11L, 3L, "c"))
    val once = apply1(destOf(Seq(1L -> "a")), b)
    val twice = apply1(once, b)
    assert(state(once) == state(twice))
    // updated_at must not advance on the retry either
    val u1 = once.filter($"id" === 1).select(CdcApplier.MetaUpdated).collect()(0)
    val u2 = twice.filter($"id" === 1).select(CdcApplier.MetaUpdated).collect()(0)
    assert(u1 == u2)
  }

  test("any batch split yields the same final state (convergence)") {
    val evs = Seq(
      ("INSERT", 1L, 1L, "a"), ("UPDATE", 2L, 1L, "b"), ("DELETE", 3L, 1L, null),
      ("INSERT", 4L, 2L, "x"), ("UPDATE", 5L, 2L, "y"),
      ("INSERT", 6L, 3L, "q"), ("DELETE", 7L, 3L, null), ("INSERT", 8L, 3L, "r"))
    val whole = state(apply1(destOf(Seq.empty), evs))
    // sampled split points (full cross product = 28 Spark jobs; 8 suffice)
    for (cut1 <- Seq(1, 3, 5); cut2 <- Seq(cut1, cut1 + 2, 7).distinct if cut2 >= cut1 && cut2 < evs.size) {
      val (b1, rest) = evs.splitAt(cut1)
      val (b2, b3) = rest.splitAt(cut2 - cut1)
      var st = apply1(destOf(Seq.empty), b1)
      if (b2.nonEmpty) st = apply1(st, b2)
      if (b3.nonEmpty) st = apply1(st, b3)
      assert(state(st) == whole, s"split at $cut1/$cut2 diverged")
    }
  }
}
