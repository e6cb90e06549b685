package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The GDPR cascade must be non-vacuous (every store loses rows for the
  * erased patient) and complete (zero residual references, recomputed from
  * the erased result). The journal attribution is key-based, so events
  * whose payload no longer names the patient (DELETE tombstones) are still
  * caught — asserted here by checking the erased journal count exceeds a
  * payload-only attribution where the fixture provides such events.
  */
class GdprErasureSpec extends SparkSpec {

  private lazy val audit = graft.SparkEntry.queries("hc_gdpr_erasure")(spark, sf())
    .collect()
    .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    .toMap

  test("erasure touches every store and leaves zero residual") {
    val expectedStores = Set("patients", "appointments", "visits",
      "appointments_journal", "visits_journal")
    assert(audit.keySet == expectedStores)
    audit.foreach { case (store, (before, erased, after, residual)) =>
      assert(erased > 0, s"$store: cascade must be non-vacuous")
      assert(residual == 0L, s"$store: $residual residual references remain")
      assert(after == before - erased, s"$store: counts inconsistent")
    }
  }

  test("erasure is surgical: the pinned fixture loses exactly the patient's rows") {
    // the fixture is deterministic (HealthcareFixturesSpec pins 100/10/170/100
    // snapshot counts); patient 41 owns 1 patient row, 4 live appointments,
    // 3 live visits, 4 appointment-journal events (key 174), 1 visit-journal
    // event
    assert(audit("patients")._2 == 1L)
    assert(audit("appointments")._2 == 4L)
    assert(audit("visits")._2 == 3L)
    assert(audit("appointments_journal")._2 == 4L)
    assert(audit("visits_journal")._2 == 1L)
  }

  test("journal attribution is by key: every event of an owned entity is erased") {
    HealthcareData.ensure(spark)
    val root = HealthcareData.Root
    val aj = spark.read.parquet(s"$root/store/appointments_journal")
    // entities patient 41 ever owned, by payload
    val ownedKeys = aj
      .filter(get_json_object(col("after"), "$.patient_id").cast("long") === 41L)
      .select("key").distinct()
    // key-based attribution must erase ALL events of those keys, whatever
    // their own payload says
    val allEventsOfOwned = aj.join(ownedKeys, "key").count()
    assert(audit("appointments_journal")._2 == allEventsOfOwned,
      s"expected $allEventsOfOwned key-attributed events")
  }
}
