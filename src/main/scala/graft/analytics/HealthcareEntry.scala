package graft.analytics

import java.nio.file.Files
import graft.QueryDef
import graft.cdc._
import graft.fixtures.HealthcareFixtures
import graft.model.HealthcareSchema
import graft.semantic.{QueryBuilder, SemanticModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible entries for the healthcare side of the engine: the
  * reference's own analytics queries, the semantic-model verified queries,
  * and a full CDC scenario. These run on the deterministic fixture (the
  * driver testdata has no healthcare tables, so no DuckDB oracle —
  * correctness is asserted by the ScalaTest suites; exposing them here
  * keeps every reference operator reachable through the driver contract).
  */
object HealthcareEntry {

  private val now = HealthcareFixtures.DefaultNow

  private def tables(s: SparkSession): HealthcareTables = {
    val m = HealthcareFixtures.snapshotTables(s, now)
    HealthcareTables(m("patients"), m("doctors"), m("appointments"), m("visits"))
  }

  /** The reference's live-demo inserts (sql/3.live_appointments.sql:38-42,
    * 163-165, 282-287) replayed as one in-memory CDC batch over the snapshot:
    * "today"-anchored queries (today's schedule, utilization) see a populated
    * day exactly the way the quickstart does — via CDC, not seed data.
    */
  private def tablesWithLiveDemo(s: SparkSession): HealthcareTables = {
    import s.implicits._
    val base = tables(s)
    val ts = java.sql.Timestamp.valueOf(s"$now 12:00:00")
    def ins(lsn: Long, id: Long, patientId: Int, doctorId: Int, dayOffset: Int,
        time: String, status: String, reason: String, aType: String) =
      CdcEvent("appointments", CdcOp.Insert, lsn, ts, id, Map(
        "patient_id" -> patientId.toString, "doctor_id" -> doctorId.toString,
        "appointment_date" -> java.time.LocalDate.parse(now).plusDays(dayOffset).toString,
        "appointment_time" -> time, "status" -> status,
        "reason_for_visit" -> reason, "appointment_type" -> aType,
        "created_at" -> s"$now 08:00:00", "updated_at" -> s"$now 08:00:00"))
    val live = Seq(
      // 8:00 AM — new appointment requests
      ins(1, 171, 5, 1, 3, "09:00:00", "scheduled", "Persistent cough and fever", "urgent"),
      ins(2, 172, 17, 2, 5, "10:30:00", "scheduled", "Blood sugar monitoring", "follow_up"),
      ins(3, 173, 29, 3, 7, "14:00:00", "scheduled", "Annual wellness visit", "routine"),
      // 10:00 AM — urgent walk-ins for TODAY
      ins(4, 174, 41, 1, 0, "10:45:00", "confirmed", "Severe allergic reaction", "urgent"),
      ins(5, 175, 53, 3, 0, "11:15:00", "confirmed", "Chest pain evaluation", "urgent"),
      // 12:00 PM — future scheduling
      ins(6, 176, 8, 4, 10, "09:30:00", "scheduled", "Follow-up cardiac evaluation", "follow_up"),
      ins(7, 177, 19, 6, 12, "10:00:00", "scheduled", "Child immunization", "routine"),
      ins(8, 178, 31, 8, 14, "14:30:00", "scheduled", "Sports injury follow-up", "follow_up"),
      ins(9, 179, 44, 9, 15, "11:00:00", "scheduled", "Skin condition check", "routine"),
      ins(10, 180, 57, 10, 17, "13:00:00", "scheduled", "Chronic disease management", "follow_up"))
    val typed = s.createDataset(live).toDF().select(
      Seq(col("op"), col("lsn"), col("commitTs"), col("key")) ++
        CdcApplier.afterImageColumns(HealthcareSchema.all("appointments"), "appointment_id"): _*)
    val merged = CdcApplier.applyBatch(base.appointments, typed, "appointment_id",
      lit(s"$now 12:00:00").cast("timestamp_ntz"))
    base.copy(appointments = merged)
  }

  /** Snapshot + 3 CDC batches end-to-end through the TableStore, returning
    * the post-state change-volume summary (the reference's live-demo final
    * check, sql/3.live_appointments.sql:366-402).
    */
  private def cdcScenario(s: SparkSession): DataFrame = {
    import s.implicits._
    val root = Files.createTempDirectory("graft-entry-cdc").toString
    // demo-sized tables: one file per commit, not one per shuffle partition
    val store = new TableStore(s, root, outputFiles = 1)
    val pipeline = new CdcPipeline(s, store, HealthcareSchema.all,
      HealthcareSchema.keyColumns,
      clock = () => lit(s"$now 12:00:00").cast("timestamp_ntz"))
    pipeline.loadSnapshot(HealthcareFixtures.all(s, now))
    val ts = java.sql.Timestamp.valueOf(s"$now 12:00:00")
    def appt(op: String, lsn: Long, id: Long, status: String) =
      CdcEvent("appointments", op, lsn, ts, id,
        if (op == CdcOp.Delete) Map.empty
        else Map("patient_id" -> "1", "doctor_id" -> "1",
          "appointment_date" -> now, "appointment_time" -> "09:00:00",
          "status" -> status, "reason_for_visit" -> "Walk-in",
          "appointment_type" -> "urgent",
          "created_at" -> s"$now 08:00:00", "updated_at" -> s"$now 08:00:00"))
    pipeline.applyEventBatch(s.createDataset(Seq(
      appt(CdcOp.Insert, 1, 201, "scheduled"),
      appt(CdcOp.Insert, 2, 202, "scheduled"))))
    pipeline.applyEventBatch(s.createDataset(Seq(
      appt(CdcOp.Update, 3, 201, "completed"),
      appt(CdcOp.Delete, 4, 1, null))))
    val t = HealthcareTables(store.read("patients"), store.read("doctors"),
      store.read("appointments"), store.read("visits"))
    HealthcareQueries.changeVolume(t)
  }

  private lazy val model = SemanticModel.loadResource("/healthcare_semantic_model.yaml")

  private def semantic(s: SparkSession, queryName: String): DataFrame = {
    val m = HealthcareFixtures.snapshotTables(s, now)
    new QueryBuilder(model, m(_)).verified(queryName)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("hc_status_distribution")((s, _) =>
      HealthcareQueries.statusDistribution(tables(s))),
    QueryDef.rowsOnly("hc_todays_schedule")((s, _) =>
      HealthcareQueries.todaysSchedule(tablesWithLiveDemo(s), now)),
    QueryDef.rowsOnly("hc_doctor_utilization_today")((s, _) =>
      HealthcareQueries.doctorUtilizationToday(tablesWithLiveDemo(s), now)),
    QueryDef.rowsOnly("hc_doctor_workload_30d")((s, _) =>
      HealthcareQueries.doctorWorkload30d(tables(s), now)),
    QueryDef.rowsOnly("hc_hourly_pattern")((s, _) =>
      HealthcareQueries.hourlyPattern(tables(s))),
    QueryDef.rowsOnly("hc_weekday_pattern")((s, _) =>
      HealthcareQueries.weekdayPattern(tables(s))),
    QueryDef.rowsOnly("hc_revenue_by_doctor")((s, _) =>
      HealthcareQueries.revenueByDoctor(tables(s))),
    QueryDef.rowsOnly("hc_revenue_by_department")((s, _) =>
      HealthcareQueries.revenueByDepartment(tables(s))),
    QueryDef.rowsOnly("hc_patient_age_distribution")((s, _) =>
      HealthcareQueries.patientAgeDistribution(tables(s), now)),
    QueryDef.rowsOnly("hc_frequent_patients")((s, _) =>
      HealthcareQueries.frequentPatients(tables(s))),
    QueryDef.rowsOnly("hc_diagnosis_frequency")((s, _) =>
      HealthcareQueries.diagnosisFrequency(tables(s))),
    QueryDef.rowsOnly("hc_change_volume")((s, _) =>
      HealthcareQueries.changeVolume(tables(s))),
    QueryDef.rowsOnly("hc_executive_summary")((s, _) =>
      HealthcareQueries.executiveSummary(tables(s), now)),
    QueryDef.rowsOnly("hc_data_quality")((s, _) =>
      HealthcareQueries.dataQualityChecks(tables(s))),
    QueryDef.rowsOnly("hc_cdc_scenario")((s, _) => cdcScenario(s)),
    QueryDef.rowsOnly("sm_total_appointments")((s, _) =>
      semantic(s, "total_appointments_summary")),
    QueryDef.rowsOnly("sm_revenue_by_doctor")((s, _) =>
      semantic(s, "revenue_by_doctor")))
}
