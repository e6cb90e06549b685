package graft.fixtures

import graft.SparkSpec
import graft.analytics.{HealthcareQueries, HealthcareTables}
import org.apache.spark.sql.functions._

/** Fixture invariants = the reference's embedded expectations made exact
  * (sql/2.verify_snapshot.sql:19-35,85-119; SURVEY §5.1).
  */
class HealthcareFixturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = {
    val m = HealthcareFixtures.snapshotTables(spark)
    HealthcareTables(m("patients"), m("doctors"), m("appointments"), m("visits"))
  }

  test("row counts match the reference snapshot: 100/10/170/100") {
    assert(t.patients.count() == 100)
    assert(t.doctors.count() == 10)
    assert(t.appointments.count() == 170)
    assert(t.visits.count() == 100)
  }

  test("generator is deterministic across invocations and partitioning") {
    val a = HealthcareFixtures.appointments(spark).orderBy("appointment_id")
      .collect().map(_.toString).toSeq
    val b = HealthcareFixtures.appointments(spark).repartition(13)
      .orderBy("appointment_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("data quality: zero NULLs in required fields (verify_snapshot 85-119)") {
    val checks = HealthcareQueries.dataQualityChecks(t).collect()
    assert(checks.length == 4)
    checks.foreach(r => assert(r.getLong(1) == 0, r.getString(0)))
  }

  test("CHECK constraints hold: status enum, type enum, charge >= 0") {
    assert(HealthcareFixtures.checkViolations(t.appointments, t.visits) == 0)
  }

  test("visits derive from completed appointments only, one per appointment") {
    val joined = t.visits.as("v")
      .join(t.appointments.as("a"), $"v.appointment_id" === $"a.appointment_id")
    assert(joined.count() == 100)
    assert(joined.filter($"a.status" =!= "completed").count() == 0)
    assert(t.visits.select(countDistinct($"appointment_id")).collect()(0).getLong(0) == 100)
  }

  test("appointment_time is zero-padded so string compare = time compare") {
    val bad = t.appointments.filter(!$"appointment_time".rlike("^[0-2][0-9]:[0-5][0-9]:00$")).count()
    assert(bad == 0)
    // the reference's time-literal predicates (live_appointments 186,210,308)
    val morning = t.appointments.filter($"appointment_time" < "12:00:00").count()
    val afternoon = t.appointments.filter($"appointment_time" >= "12:00:00").count()
    assert(morning + afternoon == 170 && morning > 0 && afternoon > 0)
  }

  test("past-appointment status mix is exactly 70/15/10/5 percent") {
    val past = HealthcareFixtures.appointments(spark).filter($"appointment_id" <= 150)
    val counts = past.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the modular permutation makes the documented mix exact (105/22/15/8)
    assert(counts("completed") == 105, counts)
    assert(counts("cancelled") == 22, counts)
    assert(counts("no_show") == 15, counts)
    assert(counts("scheduled") == 8, counts)
  }

  test("healthcare analytics suite runs green on the snapshot") {
    val now = HealthcareFixtures.DefaultNow
    assert(HealthcareQueries.statusDistribution(t).count() > 0)
    assert(HealthcareQueries.doctorUtilizationToday(t, now).count() == 10) // idle doctors kept (J4)
    assert(HealthcareQueries.doctorWorkload30d(t, now).count() > 0)
    assert(HealthcareQueries.hourlyPattern(t).count() > 0)
    assert(HealthcareQueries.weekdayPattern(t).count() == 7)
    assert(HealthcareQueries.revenueByDoctor(t).count() == 10)
    assert(HealthcareQueries.revenueByDepartment(t).count() > 0)
    assert(HealthcareQueries.patientAgeDistribution(t, now).count() > 0)
    assert(HealthcareQueries.diagnosisFrequency(t).count() > 0)
    assert(HealthcareQueries.recentlyModified(t, s"$now 00:00:00").count() == 0) // nothing updated yet
    assert(HealthcareQueries.changeVolume(t).count() == 4)
    assert(HealthcareQueries.executiveSummary(t, now).count() == 1)
    // percent-of-total sums to 100 (W1 invariant)
    val pctSum = HealthcareQueries.statusDistribution(t)
      .agg(sum("percentage")).collect()(0).getDouble(0)
    assert(math.abs(pctSum - 100.0) < 1.0)
  }
}
