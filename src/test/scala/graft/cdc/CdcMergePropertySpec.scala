package graft.cdc

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based randomized check of the merge kernel: for RANDOM event
  * sequences applied under RANDOM batch splits, the distributed
  * [[CdcApplier.applyBatch]] must land in exactly the state a trivial
  * sequential interpreter computes — latest non-delete image, soft-delete
  * flag from the last op, lsn high-water mark, updated_at stamping rule.
  * This subsumes the hand-picked convergence cases in CdcApplierSpec with
  * generated adversarial orderings (insert→delete→reinsert chains, repeated
  * keys, delete-only batches, singleton new-key inserts that must NOT
  * stamp updated_at).
  */
class CdcMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def destOf(rows: Seq[(Long, String)]): DataFrame =
    CdcApplier.snapshot(rows.toDF("id", "val"), lit("2025-01-01 00:00:00").cast("timestamp"))

  private def eventsOf(evs: Seq[(String, Long, Long, String)]): DataFrame =
    evs.map { case (op, lsn, k, v) =>
      (op, lsn, Timestamp.valueOf("2025-01-02 00:00:00"), k, Option(v))
    }.toDF("op", "lsn", "commitTs", "key", "val")

  private def applyChunks(seed: Seq[(Long, String)],
      chunks: Seq[Seq[(String, Long, Long, String)]]): Map[Long, (Option[String], Boolean, Boolean, Long)] = {
    var st = destOf(seed)
    chunks.filter(_.nonEmpty).foreach { c =>
      st = CdcApplier.applyBatch(st, eventsOf(c), "id",
        lit("2025-01-02 12:00:00").cast("timestamp"))
    }
    st.collect().map(r => r.getAs[Long]("id") -> ((
      Option(r.getAs[String]("val")),
      r.getAs[Boolean](CdcApplier.MetaDeleted),
      r.getAs[Any](CdcApplier.MetaUpdated) != null,
      r.getAs[Long](CdcApplier.MetaLsn)))).toMap
  }

  /** Sequential reference interpreter — the spec of the merge. */
  private def model(seed: Seq[(Long, String)],
      chunks: Seq[Seq[(String, Long, Long, String)]]): Map[Long, (Option[String], Boolean, Boolean, Long)] = {
    var st = seed.map { case (k, v) => k -> ((Option(v), false, false, 0L)) }.toMap
    chunks.filter(_.nonEmpty).foreach { batch =>
      val keysInBatch = batch.groupBy(_._3)
      keysInBatch.foreach { case (k, evs) =>
        val existed = st.contains(k)
        val prior = st.getOrElse(k, (None: Option[String], false, false, 0L))
        val last = evs.maxBy(_._2)
        val lastImage = evs.filter(_._1 != "DELETE") match {
          case Seq() => prior._1 // pure-delete batch keeps the prior image
          case ups => Option(ups.maxBy(_._2)._4)
        }
        val deleted = last._1 == "DELETE"
        // T6: stamped when the row pre-existed, or a new key saw >1 event
        val stamped = prior._3 || existed || evs.size > 1
        st += k -> ((lastImage, deleted, stamped, last._2))
      }
    }
    st
  }

  test("random event sequences under random splits equal the sequential model") {
    val genEvents: Gen[List[(String, Long, Long, String)]] =
      Gen.chooseNum(1, 10).flatMap { n =>
        Gen.sequence[List[(String, Long, Long, String)], (String, Long, Long, String)](
          (1 to n).map { lsn =>
            for {
              k <- Gen.chooseNum(1L, 4L)
              op <- Gen.frequency(3 -> "INSERT", 4 -> "UPDATE", 2 -> "DELETE")
            } yield (op, lsn.toLong, k, if (op == "DELETE") null else s"v$lsn")
          }.toList)
      }
    val genCase = for {
      evs <- genEvents
      nCuts <- Gen.chooseNum(0, 2)
      cuts <- Gen.listOfN(nCuts, Gen.chooseNum(0, evs.size))
    } yield (evs, cuts.sorted)

    val seed = Seq(1L -> "a", 2L -> "b")
    val prop = Prop.forAllNoShrink(genCase) { case (evs, cuts) =>
      val bounds = (0 +: cuts :+ evs.size).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => evs.slice(a, b) }
      applyChunks(seed, chunks) == model(seed, chunks)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
