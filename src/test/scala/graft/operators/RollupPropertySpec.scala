package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import graft.cdc.CdcApplier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized check of incremental rollup maintenance: for RANDOM event
  * sequences (inserts/updates/deletes over a small key space, random group
  * moves and amounts) applied under RANDOM batch splits, the incrementally
  * maintained rollup must equal a full recompute over the live state AFTER
  * EVERY batch — not just at the end, because a delta error that a later
  * batch happens to cancel must still fail the property.
  */
class RollupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalRollup.Spec(Seq("grp"), Seq("amount" -> col("amount")))
  private val live = col(CdcApplier.MetaDeleted) === false
  private val ts = lit("2025-01-01 00:00:00").cast("timestamp_ntz")

  private def eventsOf(evs: Seq[(String, Long, Long, String, Long)]): DataFrame =
    evs.map { case (op, lsn, k, g, a) =>
      (op, lsn, Timestamp.valueOf("2025-01-02 00:00:00"), k,
        Option(g), if (op == "DELETE") None else Some(a))
    }.toDF("op", "lsn", "commitTs", "key", "grp", "amount")

  private def snap(df: DataFrame) =
    df.select("grp", "n", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))
      .toSet

  test("incremental rollup equals full recompute after every random batch") {
    val genEvents: Gen[List[(String, Long, Long, String, Long)]] =
      Gen.chooseNum(1, 8).flatMap { n =>
        Gen.sequence[List[(String, Long, Long, String, Long)], (String, Long, Long, String, Long)](
          (1 to n).map { lsn =>
            for {
              k <- Gen.chooseNum(1L, 4L)
              op <- Gen.frequency(3 -> "INSERT", 4 -> "UPDATE", 2 -> "DELETE")
              g <- Gen.oneOf("x", "y", "z")
              a <- Gen.chooseNum(1L, 50L)
            } yield (op, lsn.toLong, k, if (op == "DELETE") null else g, a)
          }.toList)
      }
    val genCase = for {
      evs <- genEvents
      nCuts <- Gen.chooseNum(0, 2)
      cuts <- Gen.listOfN(nCuts, Gen.chooseNum(0, evs.size))
    } yield (evs, cuts.sorted)

    val prop = Prop.forAllNoShrink(genCase) { case (evs, cuts) =>
      var state = CdcApplier.snapshot(
        Seq((1L, "x", 10L), (2L, "y", 5L)).toDF("id", "grp", "amount"), ts)
      var rollup = IncrementalRollup.full(state.filter(live), spec)
      val bounds = (0 +: cuts :+ evs.size).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => evs.slice(a, b) }
        .filter(_.nonEmpty)
      chunks.forall { c =>
        val ev = eventsOf(c)
        val touched = ev.select(col("key").as("id")).distinct()
        val after = CdcApplier.applyBatch(state, ev, "id", ts).localCheckpoint()
        rollup = IncrementalRollup.merge(rollup,
          IncrementalRollup.batchDelta(state, after, touched, "id", live, spec),
          spec).localCheckpoint()
        state = after
        snap(rollup) == snap(IncrementalRollup.full(state.filter(live), spec))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
