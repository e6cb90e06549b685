package graft.analytics

import graft.cdc.CdcApplier.{MetaDeleted, MetaInserted, MetaUpdated}
import graft.functions.SnowflakeFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytics suite (/root/reference sql/2.verify_snapshot.sql
  * + sql/4.analytics_queries.sql, 8 categories) re-expressed as DataFrame
  * functions over the replicated healthcare tables.
  *
  * Tables carry the CDC metadata columns; queries that the reference filters
  * on `_snowflake_deleted = FALSE` do so here too. `now` is the injectable
  * clock (SURVEY §7.4.3) standing in for CURRENT_DATE.
  */
final case class HealthcareTables(
    patients: DataFrame,
    doctors: DataFrame,
    appointments: DataFrame,
    visits: DataFrame)

object HealthcareQueries {

  private def notDeleted(df: DataFrame): DataFrame =
    df.filter(col(MetaDeleted) === false)

  private def fullName(prefix: String): Column =
    concat(col(s"$prefix.first_name"), lit(" "), col(s"$prefix.last_name"))

  // ---- Category 1: appointment status (sql/4.analytics_queries.sql:27-41) ----

  /** Status distribution with % of total and LISTAGG'd distinct time slots. */
  def statusDistribution(t: HealthcareTables): DataFrame =
    notDeleted(t.appointments)
      .groupBy("status")
      .agg(
        count(lit(1)).as("appointment_count"),
        listaggDistinctOrdered(substring(col("appointment_time"), 1, 5), ", ").as("time_slots"))
      .withColumn("percentage",
        round(col("appointment_count") * lit(100.0) /
          sum(col("appointment_count")).over(Window.partitionBy()), 1))
      .orderBy(col("appointment_count").desc, col("status"))

  /** Today's schedule: 3-way join with names, formatted time
    * (sql/4.analytics_queries.sql:44-61).
    */
  def todaysSchedule(t: HealthcareTables, now: String): DataFrame =
    notDeleted(t.appointments).as("a")
      .join(broadcast(notDeleted(t.patients).as("p")), col("a.patient_id") === col("p.patient_id"))
      .join(broadcast(notDeleted(t.doctors).as("d")), col("a.doctor_id") === col("d.doctor_id"))
      .filter(col("a.appointment_date") === lit(now).cast("date"))
      .select(
        col("a.appointment_id"),
        fullName("p").as("patient_name"),
        fullName("d").as("doctor_name"),
        col("d.specialization"),
        substring(col("a.appointment_time"), 1, 5).as("appointment_time"),
        col("a.status"),
        col("a.reason_for_visit"))
      .orderBy(col("appointment_time"), col("appointment_id"))

  // ---- Category 2: doctor utilization (sql/4.analytics_queries.sql:64-95) ----

  /** Doctors LEFT JOIN today's appointments — extra predicates live in the ON
    * clause so idle doctors stay (the J4 trap, sql/4.analytics_queries.sql:74-76).
    */
  def doctorUtilizationToday(t: HealthcareTables, now: String): DataFrame =
    notDeleted(t.doctors).as("d")
      .join(notDeleted(t.appointments).as("a"),
        col("d.doctor_id") === col("a.doctor_id") &&
          col("a.appointment_date") === lit(now).cast("date"),
        "left")
      .groupBy(col("d.doctor_id"), col("d.first_name"), col("d.last_name"), col("d.specialization"))
      .agg(
        count(col("a.appointment_id")).as("todays_appointments"),
        count(when(col("a.status") === "completed", 1)).as("completed_today"),
        count(when(col("a.status") === "in_progress", 1)).as("currently_seeing"),
        count(when(col("a.status").isin("scheduled", "confirmed", "checked_in"), 1)).as("waiting"))
      .select(
        col("doctor_id"),
        concat(col("first_name"), lit(" "), col("last_name")).as("doctor_name"),
        col("specialization"), col("todays_appointments"), col("completed_today"),
        col("currently_seeing"), col("waiting"))
      .orderBy(col("todays_appointments").desc, col("doctor_id"))

  /** 30-day workload per doctor with completion/no-show rates guarded by
    * NULLIF (sql/4.analytics_queries.sql:98-120).
    */
  def doctorWorkload30d(t: HealthcareTables, now: String): DataFrame = {
    val nowD = lit(now).cast("date")
    val completed = sum(when(col("a.status") === "completed", 1).otherwise(0))
    val noShow = sum(when(col("a.status") === "no_show", 1).otherwise(0))
    val total = count(lit(1))
    notDeleted(t.appointments).as("a")
      .filter(col("a.appointment_date") >= date_sub(nowD, 30) && col("a.appointment_date") <= nowD)
      .join(broadcast(notDeleted(t.doctors).as("d")), col("a.doctor_id") === col("d.doctor_id"))
      .groupBy(col("d.doctor_id"), col("d.first_name"), col("d.last_name"))
      .agg(
        total.as("total_appointments"),
        completed.as("completed"),
        noShow.as("no_shows"),
        round(completed * lit(100.0) / nullif(total.cast("double"), lit(0.0)), 1).as("completion_rate"),
        round(noShow * lit(100.0) / nullif(total.cast("double"), lit(0.0)), 1).as("no_show_rate"))
      .select(
        col("doctor_id"),
        concat(col("first_name"), lit(" "), col("last_name")).as("doctor_name"),
        col("total_appointments"), col("completed"), col("no_shows"),
        col("completion_rate"), col("no_show_rate"))
      .orderBy(col("total_appointments").desc, col("doctor_id"))
  }

  // ---- Category 3: temporal patterns (sql/4.analytics_queries.sql:123-143) ----

  /** Appointments by hour block (group-by-expression A8). */
  def hourlyPattern(t: HealthcareTables): DataFrame =
    notDeleted(t.appointments)
      .groupBy(concat(substring(col("appointment_time"), 1, 2), lit(":00")).as("hour_block"))
      .agg(
        count(lit(1)).as("appointment_count"),
        round(avg(when(col("status") === "completed", 1.0).otherwise(0.0)) * 100, 1).as("completion_rate"))
      .orderBy("hour_block")

  /** Weekday pattern via the DAYOFWEEK shim (0=Sunday, Snowflake numbering —
    * sql/4.analytics_queries.sql:136-143).
    */
  def weekdayPattern(t: HealthcareTables): DataFrame =
    notDeleted(t.appointments)
      .groupBy(
        sfDayOfWeek(col("appointment_date")).as("day_num"),
        sfDayName(col("appointment_date")).as("day_name"))
      .agg(
        count(lit(1)).as("appointment_count"),
        round(avg(when(col("status") === "no_show", 1.0).otherwise(0.0)) * 100, 1).as("no_show_rate"))
      .orderBy("day_num")

  // ---- Category 4: revenue (sql/4.analytics_queries.sql:203-258) ----

  /** Revenue by doctor — the semantic model's verified query #3
    * (healthcare_cdc_semantic_model.yaml:623-646): LEFT OUTER join, soft-
    * delete filters on both sides, MIN/MAX visit dates, ORDER BY revenue
    * DESC NULLS LAST.
    */
  def revenueByDoctor(t: HealthcareTables): DataFrame =
    notDeleted(t.doctors).as("d")
      .join(notDeleted(t.visits).as("v"), col("d.doctor_id") === col("v.doctor_id"), "left")
      .groupBy(col("d.doctor_id"), col("d.first_name"), col("d.last_name"),
        col("d.specialization"), col("d.department"))
      .agg(
        count(col("v.visit_id")).as("total_visits"),
        sum(col("v.total_charge")).as("total_revenue"),
        min(col("v.visit_date")).as("first_visit"),
        max(col("v.visit_date")).as("last_visit"))
      .select(
        col("doctor_id"),
        concat(col("first_name"), lit(" "), col("last_name")).as("doctor_name"),
        col("specialization"), col("department"),
        col("total_visits"), col("total_revenue"), col("first_visit"), col("last_visit"))
      .orderBy(col("total_revenue").desc_nulls_last, col("doctor_id"))

  /** Revenue by department with % of total — SUM(SUM()) OVER () (W2,
    * sql/4.analytics_queries.sql:221-231).
    */
  def revenueByDepartment(t: HealthcareTables): DataFrame =
    notDeleted(t.visits).as("v")
      .join(broadcast(notDeleted(t.doctors).as("d")), col("v.doctor_id") === col("d.doctor_id"))
      .groupBy(col("d.department"))
      .agg(
        count(lit(1)).as("visit_count"),
        sum(col("v.total_charge")).as("department_revenue"),
        round(avg(col("v.total_charge")), 2).as("avg_charge"))
      .withColumn("pct_of_total",
        round(col("department_revenue") * lit(100.0) /
          sum(col("department_revenue")).over(Window.partitionBy()), 1))
      .orderBy(col("department_revenue").desc, col("department"))

  // ---- Category 5: patient demographics (sql/4.analytics_queries.sql:330-365) ----

  /** Age buckets via the Snowflake DATEDIFF(year) shim (F6/F13,
    * sql/2.verify_snapshot.sql:188-201).
    */
  def patientAgeDistribution(t: HealthcareTables, now: String): DataFrame = {
    val age = sfDateDiffYears(col("date_of_birth"), lit(now).cast("date"))
    notDeleted(t.patients)
      .groupBy(
        when(age < 18, "0-17")
          .when(age < 36, "18-35")
          .when(age < 56, "36-55")
          .when(age < 71, "56-70")
          .otherwise("71+").as("age_group"))
      .agg(
        count(lit(1)).as("patient_count"),
        countDistinct(col("insurance_provider")).as("insurers"))
      .orderBy("age_group")
  }

  /** Patient visit frequency with HAVING >= 3 (A9,
    * sql/4.analytics_queries.sql:305-327).
    */
  def frequentPatients(t: HealthcareTables): DataFrame =
    notDeleted(t.patients).as("p")
      .join(notDeleted(t.visits).as("v"), col("p.patient_id") === col("v.patient_id"))
      .groupBy(col("p.patient_id"), col("p.first_name"), col("p.last_name"))
      .agg(
        count(col("v.visit_id")).as("visit_count"),
        sum(col("v.total_charge")).as("total_spent"))
      .filter(col("visit_count") >= 3)
      .select(
        col("patient_id"),
        concat(col("first_name"), lit(" "), col("last_name")).as("patient_name"),
        col("visit_count"), col("total_spent"))
      .orderBy(col("visit_count").desc, col("patient_id"))

  // ---- Category 6: clinical (sql/4.analytics_queries.sql:261-302) ----

  /** Diagnosis frequency with % of total (W1) + top-15 (O3). */
  def diagnosisFrequency(t: HealthcareTables): DataFrame =
    notDeleted(t.visits)
      .filter(col("diagnosis").isNotNull)
      .groupBy("diagnosis")
      .agg(
        count(lit(1)).as("diagnosis_count"),
        sum(when(col("follow_up_required"), 1).otherwise(0)).as("followups"),
        sum(when(col("prescription_given"), 1).otherwise(0)).as("prescriptions"))
      .withColumn("pct",
        round(col("diagnosis_count") * lit(100.0) /
          sum(col("diagnosis_count")).over(Window.partitionBy()), 1))
      .orderBy(col("diagnosis_count").desc, col("diagnosis"))
      .limit(15)

  // ---- Category 7/8: CDC audit (sql/4.analytics_queries.sql:368-454) ----

  /** Recently-updated rows — `_SNOWFLAKE_UPDATED_AT IS NOT NULL` invariant
    * (sql/4.analytics_queries.sql:383-403).
    */
  def recentlyModified(t: HealthcareTables): DataFrame =
    t.appointments
      .filter(col(MetaUpdated).isNotNull)
      .select(
        col("appointment_id"), col("status"),
        col(MetaInserted).as("inserted_at"),
        col(MetaUpdated).as("updated_at"),
        col(MetaDeleted).as("is_deleted"))
      .orderBy(col("updated_at").desc, col("appointment_id"))
      .limit(50)

  /** Change-volume-by-table summary (U1 UNION ALL of labeled aggregates,
    * sql/4.analytics_queries.sql:405-417).
    */
  def changeVolume(t: HealthcareTables): DataFrame = {
    def vol(name: String, df: DataFrame) =
      df.agg(
        count(lit(1)).as("total_rows"),
        sum(when(col(MetaUpdated).isNotNull, 1).otherwise(0)).as("updated_rows"),
        sum(when(col(MetaDeleted), 1).otherwise(0)).as("deleted_rows"))
        .select(lit(name).as("table_name"), col("total_rows"), col("updated_rows"), col("deleted_rows"))
    vol("appointments", t.appointments)
      .unionAll(vol("patients", t.patients))
      .unionAll(vol("doctors", t.doctors))
      .unionAll(vol("visits", t.visits))
      .orderBy("table_name")
  }

  /** Executive KPI row (A10 global aggregate + multi COUNT(DISTINCT),
    * sql/4.analytics_queries.sql:432-454).
    */
  def executiveSummary(t: HealthcareTables, now: String): DataFrame = {
    val nowD = lit(now).cast("date")
    val a = notDeleted(t.appointments)
    val v = notDeleted(t.visits).as("v")
    val appts = a.agg(
      count(lit(1)).as("total_appointments"),
      countDistinct(col("patient_id")).as("unique_patients"),
      countDistinct(col("doctor_id")).as("active_doctors"),
      sum(when(col("appointment_date") >= date_sub(nowD, 7), 1).otherwise(0)).as("last_7_days"),
      round(avg(when(col("status") === "completed", 1.0).otherwise(0.0)) * 100, 1).as("completion_rate"))
    val rev = v.agg(
      sum(col("total_charge")).as("total_revenue"),
      round(avg(col("total_charge")), 2).as("avg_charge"))
    appts.crossJoin(rev)
  }

  /** Data-quality NULL checks — "all counts should be 0"
    * (sql/2.verify_snapshot.sql:85-119).
    */
  def dataQualityChecks(t: HealthcareTables): DataFrame = {
    def nullCount(name: String, df: DataFrame, cond: Column) =
      df.agg(sum(when(cond, 1).otherwise(0)).as("null_count"))
        .select(lit(name).as("check_name"), col("null_count"))
    nullCount("patients_missing_name", t.patients,
      col("first_name").isNull || col("last_name").isNull)
      .unionAll(nullCount("patients_missing_dob", t.patients, col("date_of_birth").isNull))
      .unionAll(nullCount("appointments_missing_date", t.appointments,
        col("appointment_date").isNull || col("appointment_time").isNull))
      .unionAll(nullCount("visits_missing_charge", t.visits, col("total_charge").isNull))
      .orderBy("check_name")
  }
}
