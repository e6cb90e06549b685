package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantic invariants of the SCD Type 2 history (q_cdc_scd2) and gap-based
  * sessionization (q_sessionize) that the DuckDB oracle's hash match alone
  * would not explain if they broke: version-chain contiguity, tombstone
  * handling, session-boundary gap properties, event conservation.
  */
class SessionScd2Spec extends SparkSpec {

  private lazy val scd2: Seq[Row] =
    graft.SparkEntry.queries("q_cdc_scd2")(spark, sf()).collect().toSeq

  private lazy val sessions: Seq[Row] =
    graft.SparkEntry.queries("q_sessionize")(spark, sf()).collect().toSeq

  test("scd2: version chain is contiguous — valid_to(n) == valid_from(n+1)") {
    scd2.groupBy(_.getLong(0)).foreach { case (key, rows) =>
      val byVersion = rows.sortBy(_.getLong(1))
      assert(byVersion.map(_.getLong(1)) == (1L to byVersion.size).toSeq,
        s"key $key: version_seq not 1..N")
      byVersion.sliding(2).foreach {
        case Seq(prev, next) =>
          assert(!prev.isNullAt(4) && prev.getLong(4) == next.getLong(3),
            s"key $key: valid_to(${prev.getLong(1)}) != valid_from(${next.getLong(1)})")
        case _ => ()
      }
      // exactly the last version is open-ended
      assert(byVersion.dropRight(1).forall(!_.isNullAt(4)), s"key $key: non-final open version")
      assert(byVersion.last.isNullAt(4), s"key $key: final version has a valid_to")
    }
  }

  test("scd2: at most one current version per key, and only when not tombstoned") {
    scd2.groupBy(_.getLong(0)).foreach { case (key, rows) =>
      val current = rows.filter(_.getBoolean(5))
      assert(current.size <= 1, s"key $key: ${current.size} current versions")
      val last = rows.maxBy(_.getLong(1))
      val expectCurrent = last.getString(2) != "error"
      assert(current.nonEmpty == expectCurrent,
        s"key $key: is_current=${current.nonEmpty} but last state '${last.getString(2)}'")
    }
  }

  test("sessionize: consecutive sessions of a user are separated by > 30 min") {
    sessions.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val byIdx = rows.sortBy(_.getLong(1))
      assert(byIdx.map(_.getLong(1)) == (1L to byIdx.size).toSeq,
        s"user $user: session_idx not 1..N")
      byIdx.sliding(2).foreach {
        case Seq(prev, next) =>
          assert(next.getLong(3) - prev.getLong(4) > 1800,
            s"user $user: gap between sessions ${prev.getLong(1)} and ${next.getLong(1)} <= 1800 s")
        case _ => ()
      }
    }
  }

  test("sessionize: durations are consistent and every event is in exactly one session") {
    sessions.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3), s"duration mismatch: $r")
      assert(r.getLong(5) >= 0 && r.getLong(2) >= 1, s"degenerate session: $r")
    }
    import org.apache.spark.sql.functions.col
    val nEvents = Tables.events(spark, sf()).filter(col("user_id") <= 60).count()
    assert(sessions.map(_.getLong(2)).sum == nEvents,
      "sum(n_events) over sessions != event count")
  }
}
