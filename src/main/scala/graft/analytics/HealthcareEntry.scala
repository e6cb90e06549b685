package graft.analytics

import graft.QueryDef
import graft.semantic.{QueryBuilder, SemFilter, SemMetric, SemOrder, SemRef, SemanticModel, SemanticRequest}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-visible entries for the healthcare side of the engine: the
  * reference's own analytics suite (sql/4.analytics_queries.sql +
  * sql/2.verify_snapshot.sql), the semantic-model verified queries, and the
  * CDC live-demo post-state — each with a DuckDB oracle over the SAME
  * materialized parquet files the Spark query reads (see [[HealthcareData]]),
  * so the reference workload is hash-gated end to end, not self-tested.
  */
object HealthcareEntry {

  import HealthcareData.{pq, Now, NowTs}

  private val nowDate = java.time.LocalDate.parse(Now)
  private def daysAgo(n: Int): String = nowDate.minusDays(n).toString
  private val D30 = daysAgo(30)
  private val D60 = daysAgo(60)
  private val Ts24h = s"${daysAgo(1)} 13:00:00"
  private val Ts7d = s"${daysAgo(7)} 13:00:00"

  // snapshot state (post initial load) / live state (post CDC demo)
  private val P = pq("patients")
  private val D = pq("doctors")
  private val A = pq("appointments")
  private val V = pq("visits")
  private val DL = pq("doctors_live")
  private val AL = pq("appointments_live")
  private val VL = pq("visits_live")

  private val NotDel = "_snowflake_deleted = FALSE"

  /** Version-proof HALF_UP money average for oracle SQL, in integer cents.
    *
    * `ROUND(quotient, 2)` semantics drift across DuckDB versions: on the
    * half-cent quotient 523.77/2 = 261.885 a ROUND over DOUBLE sees the
    * binary value 261.88499… and (correctly) rounds DOWN in 1.1+, while
    * Spark's decimal HALF_UP rounds UP — four rounds of `hc_daily_revenue`
    * hash failures. So the oracle never rounds a quotient: it computes
    * HALF_UP itself with BIGINT floor division, `(2c + n) // (2n)` (exact
    * for the CHECK >= 0 charges), and the final `/100` is the same IEEE
    * division in every engine. Bit-identical to Spark's
    * [[graft.functions.SnowflakeFunctions.moneyAvg2]] (decimal HALF_UP on
    * the exact quotient).
    */
  private def moneyAvgSql(x: String): String =
    s"CAST((2*CAST(SUM(CAST($x AS DECIMAL(18,2)))*100 AS BIGINT) + COUNT($x)) // (2*COUNT($x)) AS DOUBLE)/100"

  /** Lifetime change-volume oracle (sql/3.live_appointments.sql:366-402),
    * shared verbatim by the flat and bucketed CDC scenario entries.
    */
  private lazy val changeVolumeSql: String = {
    def vol(name: String, t: String) =
      s"""SELECT '$name' AS table_name, COUNT(*) AS total_rows,
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS updated_rows,
         |       CAST(SUM(CASE WHEN _snowflake_deleted THEN 1 ELSE 0 END) AS BIGINT) AS deleted_rows
         |FROM $t""".stripMargin
    s"""${vol("appointments", AL)}
       |UNION ALL
       |${vol("patients", P)}
       |UNION ALL
       |${vol("doctors", DL)}
       |UNION ALL
       |${vol("visits", VL)}
       |ORDER BY table_name""".stripMargin
  }

  private def snap(s: SparkSession): HealthcareTables = HealthcareData.tables(s)
  private def live(s: SparkSession): HealthcareTables = HealthcareData.liveTables(s)

  private lazy val model = SemanticModel.loadResource("/healthcare_semantic_model.yaml")

  /** Semantic queries run on the CDC-synced (post-demo) state, the way the
    * reference's agent does (semantic-models/healthcare_cdc_semantic_model.yaml).
    */
  private def semantic(s: SparkSession, queryName: String): DataFrame = {
    val t = live(s)
    val byName = Map[String, DataFrame](
      "patients" -> t.patients, "doctors" -> t.doctors,
      "appointments" -> t.appointments, "visits" -> t.visits)
    new QueryBuilder(model, byName(_)).verified(queryName)
  }

  private def semanticCompile(s: SparkSession, req: SemanticRequest): DataFrame = {
    val t = live(s)
    val byName = Map[String, DataFrame](
      "patients" -> t.patients, "doctors" -> t.doctors,
      "appointments" -> t.appointments, "visits" -> t.visits)
    new QueryBuilder(model, byName(_)).compile(req)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- category 1: operational dashboards ----
    QueryDef(
      "hc_status_distribution",
      s"""SELECT status, COUNT(*) AS appointment_count,
         |       STRING_AGG(DISTINCT substr(appointment_time,1,5), ', ' ORDER BY substr(appointment_time,1,5)) AS time_slots,
         |       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS percentage
         |FROM $A WHERE $NotDel
         |GROUP BY status""".stripMargin)((s, _) =>
      HealthcareQueries.statusDistribution(snap(s))),

    QueryDef(
      "hc_todays_schedule",
      s"""SELECT a.appointment_id,
         |       p.first_name || ' ' || p.last_name AS patient_name,
         |       d.first_name || ' ' || d.last_name AS doctor_name,
         |       d.specialization,
         |       substr(a.appointment_time,1,5) AS appointment_time,
         |       a.status, a.reason_for_visit
         |FROM $AL a
         |JOIN $P p ON a.patient_id = p.patient_id AND p.$NotDel
         |JOIN $DL d ON a.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE a.$NotDel AND a.appointment_date = DATE '$Now'""".stripMargin)((s, _) =>
      HealthcareQueries.todaysSchedule(live(s), Now)),

    QueryDef(
      "hc_patients_in_clinic",
      s"""SELECT p.first_name || ' ' || p.last_name AS patient_name, p.phone,
         |       d.first_name || ' ' || d.last_name AS doctor_name, d.specialization,
         |       a.appointment_time, a.status, a.reason_for_visit,
         |       DATE_DIFF('minute', CAST(a.appointment_date || ' ' || a.appointment_time AS TIMESTAMP), TIMESTAMP '$NowTs') AS minutes_since_appointment
         |FROM $AL a
         |JOIN $P p ON a.patient_id = p.patient_id AND p.$NotDel
         |JOIN $DL d ON a.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE a.$NotDel AND a.appointment_date = DATE '$Now'
         |  AND a.status IN ('checked_in','in_progress')""".stripMargin)((s, _) =>
      HealthcareQueries.patientsInClinic(live(s), Now, NowTs)),

    QueryDef(
      "hc_doctor_utilization_today",
      s"""SELECT d.doctor_id,
         |       d.first_name || ' ' || d.last_name AS doctor_name, d.specialization,
         |       COUNT(a.appointment_id) AS todays_appointments,
         |       COUNT(CASE WHEN a.status = 'completed' THEN 1 END) AS completed_today,
         |       COUNT(CASE WHEN a.status = 'in_progress' THEN 1 END) AS currently_seeing,
         |       COUNT(CASE WHEN a.status IN ('scheduled','confirmed','checked_in') THEN 1 END) AS waiting
         |FROM $DL d LEFT JOIN $AL a
         |  ON d.doctor_id = a.doctor_id AND a.appointment_date = DATE '$Now' AND a.$NotDel
         |WHERE d.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization""".stripMargin)((s, _) =>
      HealthcareQueries.doctorUtilizationToday(live(s), Now)),

    // ---- category 2: patient flow ----
    QueryDef(
      "hc_avg_wait_by_date",
      s"""SELECT appointment_date,
         |       AVG(DATE_DIFF('minute', created_at, updated_at)) AS avg_minutes_to_update,
         |       COUNT(*) AS appointments
         |FROM $A WHERE $NotDel
         |  AND status IN ('completed','cancelled','no_show')
         |  AND created_at <> updated_at
         |  AND appointment_date >= DATE '$D30'
         |GROUP BY appointment_date
         |ORDER BY appointment_date DESC LIMIT 30""".stripMargin)((s, _) =>
      HealthcareQueries.avgWaitByDate(snap(s), Now)),

    QueryDef(
      "hc_completion_rate_30d",
      s"""SELECT appointment_date, COUNT(*) AS total_appointments,
         |       CAST(SUM(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS completed,
         |       CAST(SUM(CASE WHEN status = 'cancelled' THEN 1 ELSE 0 END) AS BIGINT) AS cancelled,
         |       CAST(SUM(CASE WHEN status = 'no_show' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
         |       ROUND(SUM(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 1) AS completion_rate,
         |       ROUND(SUM(CASE WHEN status = 'no_show' THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 1) AS no_show_rate
         |FROM $A WHERE $NotDel
         |  AND appointment_date >= DATE '$D30' AND appointment_date <= DATE '$Now'
         |GROUP BY appointment_date""".stripMargin)((s, _) =>
      HealthcareQueries.completionRate30d(snap(s), Now)),

    QueryDef(
      "hc_doctor_workload_30d",
      s"""SELECT d.doctor_id, d.first_name || ' ' || d.last_name AS doctor_name,
         |       COUNT(*) AS total_appointments,
         |       CAST(SUM(CASE WHEN a.status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS completed,
         |       CAST(SUM(CASE WHEN a.status = 'no_show' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
         |       ROUND(SUM(CASE WHEN a.status = 'completed' THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 1) AS completion_rate,
         |       ROUND(SUM(CASE WHEN a.status = 'no_show' THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 1) AS no_show_rate
         |FROM $A a JOIN $D d ON a.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE a.$NotDel
         |  AND a.appointment_date >= DATE '$D30' AND a.appointment_date <= DATE '$Now'
         |GROUP BY d.doctor_id, d.first_name, d.last_name""".stripMargin)((s, _) =>
      HealthcareQueries.doctorWorkload30d(snap(s), Now)),

    // ---- category 3: temporal patterns ----
    QueryDef(
      "hc_hourly_pattern",
      s"""SELECT substr(appointment_time,1,2) || ':00' AS hour_block,
         |       COUNT(*) AS appointment_count,
         |       ROUND(AVG(CASE WHEN status = 'completed' THEN 1.0 ELSE 0.0 END) * 100, 1) AS completion_rate
         |FROM $A WHERE $NotDel
         |GROUP BY hour_block""".stripMargin)((s, _) =>
      HealthcareQueries.hourlyPattern(snap(s))),

    QueryDef(
      "hc_weekday_pattern",
      s"""SELECT CAST(EXTRACT(dow FROM appointment_date) AS INT) AS day_num,
         |       strftime(appointment_date, '%a') AS day_name,
         |       COUNT(*) AS appointment_count,
         |       ROUND(AVG(CASE WHEN status = 'no_show' THEN 1.0 ELSE 0.0 END) * 100, 1) AS no_show_rate
         |FROM $A WHERE $NotDel
         |GROUP BY 1, 2""".stripMargin)((s, _) =>
      HealthcareQueries.weekdayPattern(snap(s))),

    // ---- category 3b: doctor performance ----
    QueryDef(
      "hc_avg_appts_per_day",
      s"""SELECT d.first_name || ' ' || d.last_name AS doctor_name, d.specialization,
         |       COUNT(a.appointment_id) AS total_appointments,
         |       COUNT(DISTINCT a.appointment_date) AS days_with_appointments,
         |       ROUND(COUNT(a.appointment_id) * 1.0 / NULLIF(CAST(COUNT(DISTINCT a.appointment_date) AS DOUBLE), 0), 1) AS avg_appointments_per_day
         |FROM $D d LEFT JOIN $A a
         |  ON d.doctor_id = a.doctor_id AND a.appointment_date >= DATE '$D30'
         | AND a.status = 'completed' AND a.$NotDel
         |WHERE d.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization
         |HAVING COUNT(DISTINCT a.appointment_date) > 0""".stripMargin)((s, _) =>
      HealthcareQueries.avgAppointmentsPerDay(snap(s), Now)),

    QueryDef(
      "hc_satisfaction_proxy",
      s"""SELECT d.first_name || ' ' || d.last_name AS doctor_name, d.specialization,
         |       COUNT(v.visit_id) AS total_visits,
         |       CAST(SUM(CASE WHEN v.follow_up_required THEN 1 ELSE 0 END) AS BIGINT) AS followups_needed,
         |       ROUND(SUM(CASE WHEN v.follow_up_required THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(v.visit_id) AS DOUBLE), 0), 1) AS followup_rate,
         |       CAST(SUM(CASE WHEN v.prescription_given THEN 1 ELSE 0 END) AS BIGINT) AS prescriptions_written,
         |       ROUND(SUM(CASE WHEN v.prescription_given THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(v.visit_id) AS DOUBLE), 0), 1) AS prescription_rate
         |FROM $D d JOIN $V v ON d.doctor_id = v.doctor_id AND v.$NotDel
         |WHERE d.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization""".stripMargin)((s, _) =>
      HealthcareQueries.satisfactionProxy(snap(s))),

    // ---- category 4: revenue ----
    QueryDef(
      "hc_revenue_by_doctor",
      s"""SELECT d.doctor_id, d.first_name || ' ' || d.last_name AS doctor_name,
         |       d.specialization, d.department,
         |       COUNT(v.visit_id) AS total_visits,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         |       MIN(v.visit_date) AS first_visit, MAX(v.visit_date) AS last_visit
         |FROM $D d LEFT JOIN $V v ON d.doctor_id = v.doctor_id AND v.$NotDel
         |WHERE d.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization, d.department""".stripMargin)((s, _) =>
      HealthcareQueries.revenueByDoctor(snap(s))),

    QueryDef(
      "hc_revenue_by_department",
      s"""SELECT d.department, COUNT(*) AS visit_count,
         |       ${moneyAvgSql("v.total_charge")} AS avg_charge,
         |       ROUND(CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) * 100.0 / CAST(SUM(SUM(CAST(v.total_charge AS DECIMAL(18,2)))) OVER () AS DOUBLE), 1) AS pct_of_total,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS department_revenue
         |FROM $V v JOIN $D d ON v.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE v.$NotDel
         |GROUP BY d.department""".stripMargin)((s, _) =>
      HealthcareQueries.revenueByDepartment(snap(s))),

    // min/max as DOUBLE: this query was the suite's ONLY emitter of raw
    // DECIMAL output columns and its only driver-red row for five rounds
    // (while the local strict gate passed) — the gate's pyarrow and DuckDB
    // readers normalize decimals differently, so driver-visible outputs use
    // BIGINT/DOUBLE/DATE/STRING only. The hc_dailyrev_probe_* entries below
    // make the driver's own gate confirm the localization.
    QueryDef(
      "hc_daily_revenue",
      s"""SELECT visit_date, COUNT(*) AS visit_count,
         |       CAST(SUM(CAST(total_charge AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
         |       ${moneyAvgSql("total_charge")} AS avg_revenue_per_visit,
         |       CAST(MIN(total_charge) AS DOUBLE) AS min_charge,
         |       CAST(MAX(total_charge) AS DOUBLE) AS max_charge
         |FROM $V WHERE $NotDel AND visit_date >= DATE '$D30'
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareQueries.dailyRevenueTrend(snap(s), Now)),

    // ---- hc_daily_revenue per-column diagnostic probes (r7 verdict #1) ----
    // Same FROM/WHERE/GROUP BY; one column family each; money as BIGINT
    // integer cents (exact row-level DECIMAL(18,2)*100) except the final
    // probe, which deliberately re-emits the raw DECIMAL min/max so a red
    // row THERE + green cents probes confirms the decimal-normalization
    // diagnosis from the driver's own CORRECTNESS output.
    QueryDef(
      "hc_dailyrev_probe_count",
      s"""SELECT visit_date, COUNT(*) AS visit_count
         |FROM $V WHERE $NotDel AND visit_date >= DATE '$D30'
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareQueries.dailyRevenueProbeCount(snap(s), Now)),

    QueryDef(
      "hc_dailyrev_probe_sum_cents",
      s"""SELECT visit_date,
         |       CAST(SUM(CAST(CAST(total_charge AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS revenue_cents
         |FROM $V WHERE $NotDel AND visit_date >= DATE '$D30'
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareQueries.dailyRevenueProbeSumCents(snap(s), Now)),

    QueryDef(
      "hc_dailyrev_probe_avg_cents",
      s"""SELECT visit_date,
         |       CAST((2*CAST(SUM(CAST(CAST(total_charge AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) + COUNT(*))
         |            // (2*COUNT(*)) AS BIGINT) AS avg_cents
         |FROM $V WHERE $NotDel AND visit_date >= DATE '$D30'
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareQueries.dailyRevenueProbeAvgCents(snap(s), Now)),

    QueryDef(
      "hc_dailyrev_probe_minmax_cents",
      s"""SELECT visit_date,
         |       MIN(CAST(CAST(total_charge AS DECIMAL(18,2))*100 AS BIGINT)) AS min_cents,
         |       MAX(CAST(CAST(total_charge AS DECIMAL(18,2))*100 AS BIGINT)) AS max_cents
         |FROM $V WHERE $NotDel AND visit_date >= DATE '$D30'
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareQueries.dailyRevenueProbeMinMaxCents(snap(s), Now)),

    // Incremental rollup maintenance vs full recompute: the Spark side folds
    // per-batch CDC deltas into the daily-revenue rollup (never rescanning
    // the table); the oracle recomputes the same rollup from scratch over
    // the final materialized visits_live state. Hash-equality = incremental
    // maintenance is exactly the rescan result (additive LONG measures).
    QueryDef(
      "hc_rollup_incremental",
      s"""SELECT visit_date, COUNT(*) AS visit_count,
         |       CAST(SUM(CAST(CAST(total_charge AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS revenue_cents
         |FROM $VL WHERE $NotDel
         |GROUP BY visit_date""".stripMargin)((s, _) =>
      HealthcareData.incrementalVisitRollup(s)),

    // NOTE: the deliberately-red raw-DECIMAL canary (hc_dailyrev_probe_minmax_raw)
    // was retired after round 8 confirmed the diagnosis: the driver's pyarrow and
    // DuckDB readers normalize DECIMAL differently, so driver-visible outputs must
    // be BIGINT/DOUBLE/DATE/STRING/BOOLEAN only. The probe lives on as a ScalaTest
    // spec (DecimalBoundarySpec) asserting the raw values ARE value-identical to
    // the green cents probes — the red was reader normalization, not data.

    QueryDef(
      "hc_monthly_revenue",
      s"""SELECT strftime(visit_date, '%Y-%m') AS month, COUNT(*) AS total_visits,
         |       CAST(SUM(CAST(total_charge AS DECIMAL(18,2))) AS DOUBLE) AS monthly_revenue,
         |       ${moneyAvgSql("total_charge")} AS avg_revenue_per_visit,
         |       COUNT(DISTINCT patient_id) AS unique_patients
         |FROM $V WHERE $NotDel
         |GROUP BY month""".stripMargin)((s, _) =>
      HealthcareQueries.monthlyRevenueSummary(snap(s))),

    // ---- category 5: patient demographics ----
    QueryDef(
      "hc_patient_age_distribution",
      s"""SELECT CASE WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM date_of_birth) < 18 THEN '0-17'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM date_of_birth) < 36 THEN '18-35'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM date_of_birth) < 56 THEN '36-55'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM date_of_birth) < 71 THEN '56-70'
         |            ELSE '71+' END AS age_group,
         |       COUNT(*) AS patient_count,
         |       COUNT(DISTINCT insurance_provider) AS insurers
         |FROM $P WHERE $NotDel
         |GROUP BY age_group""".stripMargin)((s, _) =>
      HealthcareQueries.patientAgeDistribution(snap(s), Now)),

    QueryDef(
      "hc_patient_demographics",
      s"""SELECT CASE WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM p.date_of_birth) < 18 THEN 'Pediatric (0-17)'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM p.date_of_birth) <= 30 THEN 'Young Adult (18-30)'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM p.date_of_birth) <= 50 THEN 'Adult (31-50)'
         |            WHEN EXTRACT(year FROM DATE '$Now') - EXTRACT(year FROM p.date_of_birth) <= 65 THEN 'Middle Age (51-65)'
         |            ELSE 'Senior (65+)' END AS age_group,
         |       COUNT(DISTINCT p.patient_id) AS patient_count,
         |       COUNT(v.visit_id) AS total_visits,
         |       ${moneyAvgSql("v.total_charge")} AS avg_visit_cost
         |FROM $P p LEFT JOIN $V v ON p.patient_id = v.patient_id AND v.$NotDel
         |WHERE p.$NotDel
         |GROUP BY 1""".stripMargin)((s, _) =>
      HealthcareQueries.patientDemographics(snap(s), Now)),

    QueryDef(
      "hc_frequent_patients",
      s"""SELECT p.patient_id, p.first_name || ' ' || p.last_name AS patient_name,
         |       COUNT(v.visit_id) AS visit_count,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
         |FROM $P p JOIN $V v ON p.patient_id = v.patient_id AND v.$NotDel
         |WHERE p.$NotDel
         |GROUP BY p.patient_id, p.first_name, p.last_name
         |HAVING COUNT(v.visit_id) >= 3""".stripMargin)((s, _) =>
      HealthcareQueries.frequentPatients(snap(s))),

    QueryDef(
      "hc_new_vs_returning",
      s"""WITH patient_visits AS (
         |  SELECT p.patient_id AS pv_patient_id, MIN(v0.visit_date) AS first_visit_ever
         |  FROM $P p LEFT JOIN $V v0 ON p.patient_id = v0.patient_id AND v0.$NotDel
         |  WHERE p.$NotDel
         |  GROUP BY p.patient_id)
         |SELECT CASE WHEN pv.first_visit_ever >= DATE '$D30' THEN 'New Patient'
         |            ELSE 'Returning Patient' END AS patient_type,
         |       COUNT(DISTINCT v.patient_id) AS patient_count,
         |       COUNT(v.visit_id) AS total_visits,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
         |FROM $V v JOIN patient_visits pv ON v.patient_id = pv.pv_patient_id
         |WHERE v.$NotDel AND v.visit_date >= DATE '$D30'
         |GROUP BY patient_type""".stripMargin)((s, _) =>
      HealthcareQueries.newVsReturning(snap(s), Now)),

    // ---- category 6: clinical ----
    QueryDef(
      "hc_diagnosis_frequency",
      s"""SELECT diagnosis, COUNT(*) AS diagnosis_count,
         |       CAST(SUM(CASE WHEN follow_up_required THEN 1 ELSE 0 END) AS BIGINT) AS followups,
         |       CAST(SUM(CASE WHEN prescription_given THEN 1 ELSE 0 END) AS BIGINT) AS prescriptions,
         |       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS pct
         |FROM $V WHERE $NotDel AND diagnosis IS NOT NULL
         |GROUP BY diagnosis
         |ORDER BY diagnosis_count DESC, diagnosis LIMIT 15""".stripMargin)((s, _) =>
      HealthcareQueries.diagnosisFrequency(snap(s))),

    QueryDef(
      "hc_reasons_for_visit",
      s"""SELECT reason_for_visit, COUNT(*) AS frequency,
         |       CAST(SUM(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS completed,
         |       CAST(SUM(CASE WHEN status = 'no_show' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
         |       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS percentage_of_appointments
         |FROM $A WHERE $NotDel AND appointment_date >= DATE '$D60'
         |GROUP BY reason_for_visit
         |ORDER BY frequency DESC, reason_for_visit LIMIT 15""".stripMargin)((s, _) =>
      HealthcareQueries.reasonsForVisit(snap(s), Now)),

    QueryDef(
      "hc_type_by_specialization",
      s"""SELECT d.specialization, a.appointment_type, COUNT(*) AS type_count,
         |       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (PARTITION BY d.specialization), 1) AS percentage
         |FROM $A a JOIN $D d ON a.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE a.$NotDel AND a.appointment_date >= DATE '$D60'
         |GROUP BY d.specialization, a.appointment_type""".stripMargin)((s, _) =>
      HealthcareQueries.typeBySpecialization(snap(s), Now)),

    // ---- category 7: CDC audit trail (post-live-demo state) ----
    QueryDef(
      "hc_recently_modified",
      s"""SELECT appointment_id, patient_id, doctor_id, appointment_date,
         |       appointment_time, status, reason_for_visit,
         |       _snowflake_inserted_at AS inserted_at,
         |       _snowflake_updated_at AS updated_at,
         |       _snowflake_deleted AS is_deleted
         |FROM $AL
         |WHERE _snowflake_updated_at IS NOT NULL
         |  AND _snowflake_updated_at >= TIMESTAMP '$Ts24h'
         |ORDER BY updated_at DESC, appointment_id LIMIT 50""".stripMargin)((s, _) =>
      HealthcareQueries.recentlyModified(live(s), Ts24h)),

    QueryDef(
      "hc_change_volume",
      s"""SELECT 'appointments' AS table_name, COUNT(*) AS total_records,
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS insert_only,
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS updated,
         |       CAST(SUM(CASE WHEN _snowflake_deleted THEN 1 ELSE 0 END) AS BIGINT) AS deleted
         |FROM $AL
         |WHERE _snowflake_inserted_at >= TIMESTAMP '$Ts24h' OR _snowflake_updated_at >= TIMESTAMP '$Ts24h'
         |UNION ALL
         |SELECT 'visits', COUNT(*),
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         |       CAST(SUM(CASE WHEN _snowflake_deleted THEN 1 ELSE 0 END) AS BIGINT)
         |FROM $VL
         |WHERE _snowflake_inserted_at >= TIMESTAMP '$Ts24h' OR _snowflake_updated_at >= TIMESTAMP '$Ts24h'
         |ORDER BY table_name""".stripMargin)((s, _) =>
      HealthcareQueries.changeVolume24h(live(s), Ts24h)),

    QueryDef(
      "hc_update_frequency",
      s"""SELECT date_trunc('hour', _snowflake_updated_at) AS hour_block,
         |       COUNT(*) AS updates,
         |       COUNT(DISTINCT appointment_id) AS unique_appointments_updated
         |FROM $AL
         |WHERE _snowflake_updated_at IS NOT NULL
         |  AND _snowflake_updated_at >= TIMESTAMP '$Ts7d'
         |GROUP BY hour_block""".stripMargin)((s, _) =>
      HealthcareQueries.updateFrequency(live(s), Ts7d)),

    /** Live-demo final check: lifetime change volume per table
      * (sql/3.live_appointments.sql:366-402). The same oracle gates BOTH
      * merge implementations below — edit it once, both stay in lockstep.
      */
    QueryDef("hc_cdc_scenario", changeVolumeSql)((s, _) =>
      HealthcareQueries.changeVolume(live(s))),

    /** Same final check over the BUCKETED copy-on-write store: the demo's
      * batches merged partition-scoped ([[graft.cdc.BucketedTableStore]]).
      * The oracle reads the flat-path parquet, so a green row proves the
      * bucketed merge and the whole-table merge converge to the same state
      * AND match the independent DuckDB expectation.
      */
    QueryDef("hc_cdc_bucketed_scenario", changeVolumeSql)((s, _) =>
      HealthcareQueries.changeVolume(HealthcareData.bucketedLiveTables(s))),

    /** Same final check over the STREAMING path: the demo batches as a
      * JSON-lines file feed through readStream → trigger → foreachBatch
      * ([[graft.cdc.CdcPipeline.start]]) — the reference's EP1/T1 loop under
      * the driver gate instead of spec-only.
      */
    QueryDef("hc_cdc_stream", changeVolumeSql)((s, _) =>
      HealthcareQueries.changeVolume(HealthcareData.streamedLiveTables(s))),

    /** Same final check through the DEBEZIUM CONNECTOR boundary: the demo
      * batches encoded as public Debezium change-event JSON, streamed as the
      * stand-in topic, decoded by [[graft.cdc.DebeziumSource.parse]], merged
      * by the same pipeline. Reuses the flat-path oracle, so a green row
      * proves wire-format round-trip + merge convergence in one gate.
      */
    QueryDef("hc_cdc_debezium", changeVolumeSql)((s, _) =>
      HealthcareQueries.changeVolume(HealthcareData.debeziumLiveTables(s))),

    /** Replication divergence detector — the strong form of the reference's
      * verify-snapshot step (sql/2.verify_snapshot.sql compares counts; a
      * checksum compares CONTENT). One order-independent checksum per live
      * appointments store: every row renders to a canonical string (fixed
      * column order, fixed timestamp format, NULL sentinel), hashes through
      * the md5 hex chain, and the top 40 bits SUM over rows — commutative,
      * so partitioning/parallelism cannot move the value, and any single
      * changed/missing/extra row almost surely does. All four sink
      * implementations (whole-table merge, bucketed per-bucket merge,
      * streaming foreachBatch, Debezium wire replay) must land on the ONE
      * value the oracle derives from the flat dump — four independently-
      * built stores proven identical row-for-row, not just count-identical.
      *
      * The checksum covers the CLOCK-INDEPENDENT replica content: all
      * business columns, the soft-delete flag, `updated_at IS NOT NULL`,
      * and the per-row `_cdc_lsn` high-water mark. The raw
      * `_snowflake_inserted_at`/`_snowflake_updated_at` values are
      * deliberately OUT: they are destination apply-clock readings, and
      * this very gate caught them diverging (first checksum run: flat and
      * bucketed stamp each staged batch's recorded time, e.g. 12:30;
      * the streaming and Debezium replays stamp their own apply clock,
      * 13:00 — same rows, same lsns, different ingestion clocks). That is
      * the correct semantics of an ingestion timestamp, so the gate pins
      * what replicas MUST agree on and leaves the clock reading to each
      * sink's deployment.
      *
      * Scale: a map-only projection + a 1-row map-side-combined aggregate
      * per store — the cheapest possible full-content comparison of a
      * replica (no sort, no join, one scan each side), which is exactly
      * why checksum-based replica validation is the production pattern.
      * The per-row 40-bit terms sum EXACTLY (decimal accumulator in Spark,
      * HUGEINT in DuckDB) and reduce mod 2⁶² at the end — a plain BIGINT
      * sum would cross 2⁶³ around 17M rows and the two engines disagree on
      * overflow (DuckDB throws on the HUGEINT→BIGINT cast, non-ANSI Spark
      * wraps), i.e. the gate would break exactly at production scale.
      */
    QueryDef(
      "hc_cdc_store_checksum", {
        def cks(alias: String) =
          s"""SELECT '$alias' AS store, COUNT(*) AS n_rows,
             |  CAST(SUM(CAST(('0x' || substr(md5_payload, 1, 10)) AS BIGINT))
             |       % 4611686018427387904 AS BIGINT) AS content_checksum
             |FROM (SELECT md5(
             |    concat_ws('|',
             |      COALESCE(CAST(appointment_id AS VARCHAR), '~'),
             |      COALESCE(CAST(patient_id AS VARCHAR), '~'),
             |      COALESCE(CAST(doctor_id AS VARCHAR), '~'),
             |      COALESCE(CAST(appointment_date AS VARCHAR), '~'),
             |      COALESCE(appointment_time, '~'),
             |      COALESCE(status, '~'),
             |      COALESCE(reason_for_visit, '~'),
             |      COALESCE(appointment_type, '~'),
             |      COALESCE(STRFTIME(created_at, '%Y-%m-%d %H:%M:%S'), '~'),
             |      COALESCE(STRFTIME(updated_at, '%Y-%m-%d %H:%M:%S'), '~'),
             |      CAST(_snowflake_updated_at IS NOT NULL AS VARCHAR),
             |      COALESCE(CAST(_snowflake_deleted AS VARCHAR), '~'),
             |      COALESCE(CAST(_cdc_lsn AS VARCHAR), '~'))) AS md5_payload
             |      FROM $AL) t""".stripMargin
        Seq("bucketed", "debezium", "flat", "streamed").map(cks)
          .mkString("", "\nUNION ALL\n", "\nORDER BY store")
      })((s, _) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graft.SketchExpressions
      def face(label: String, t: HealthcareTables): DataFrame = {
        val rendered = Seq(
          col("appointment_id").cast("string"),
          col("patient_id").cast("string"),
          col("doctor_id").cast("string"),
          col("appointment_date").cast("string"),
          col("appointment_time"),
          col("status"),
          col("reason_for_visit"),
          col("appointment_type"),
          date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss"),
          date_format(col("updated_at"), "yyyy-MM-dd HH:mm:ss"),
          col("_snowflake_updated_at").isNotNull.cast("string"),
          col("_snowflake_deleted").cast("string"),
          col("_cdc_lsn").cast("string"))
        val payload = concat_ws("|", rendered.map(c => coalesce(c, lit("~"))): _*)
        t.appointments
          .select(shiftrightunsigned(SketchExpressions.md5Hi64(payload), 24).as("h"))
          // exact decimal accumulator, reduced mod 2^62 at the end — a raw
          // BIGINT sum of 40-bit terms overflows around 17M rows and the
          // engines disagree on overflow behavior (see Scaladoc)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("h").cast("decimal(38,0)")).as("hsum"))
          .select(lit(label).as("store"), col("n_rows"),
            expr("CAST(hsum % 4611686018427387904 AS BIGINT)").as("content_checksum"))
      }
      face("flat", HealthcareData.liveTables(s))
        .unionByName(face("bucketed", HealthcareData.bucketedLiveTables(s)))
        .unionByName(face("streamed", HealthcareData.streamedLiveTables(s)))
        .unionByName(face("debezium", HealthcareData.debeziumLiveTables(s)))
        .orderBy("store")
    }),

    /** The 60 s sync-cadence SLA as an oracle-gated fact: per-batch apply
      * latencies recorded from the REAL streamed replay's progress
      * (CdcMetrics), aggregated against the budget in both engines.
      */
    QueryDef(
      "hc_cdc_cadence",
      s"""SELECT COUNT(*) AS n_batches,
         |       CAST(SUM(input_rows) AS BIGINT) AS total_rows,
         |       CAST(SUM(CASE WHEN within_budget THEN 1 ELSE 0 END) AS BIGINT) AS batches_within_budget,
         |       MAX(apply_millis) AS max_apply_millis,
         |       BOOL_AND(within_budget) AS cadence_met
         |FROM ${pq("cdc_metrics")}""".stripMargin)((s, _) =>
      HealthcareQueries.cadenceSummary(HealthcareData.cdcMetrics(s))),

    /** Schema evolution through the real pipeline: the live demo replayed
      * with a source ALTER TABLE ADD COLUMN before the 12:00 batch (see
      * HealthcareData state 4). The gate pins that pre-evolution rows read
      * NULL in the added column, evolved upserts carry values, and CDC
      * metadata (soft deletes, updated_at) is preserved across the widening.
      */
    QueryDef(
      "hc_cdc_schema_evolution",
      s"""SELECT priority, COUNT(*) AS n_appointments,
         |       COUNT(DISTINCT status) AS n_statuses,
         |       CAST(SUM(CASE WHEN _snowflake_updated_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS updated_rows,
         |       CAST(SUM(CASE WHEN _snowflake_deleted THEN 1 ELSE 0 END) AS BIGINT) AS deleted_rows,
         |       MIN(appointment_id) AS min_id, MAX(appointment_id) AS max_id
         |FROM ${pq("appointments_evolved")}
         |GROUP BY priority""".stripMargin)((s, _) =>
      HealthcareQueries.schemaEvolutionAudit(HealthcareData.evolvedAppointments(s))),

    // ---- category 8: executive KPIs ----
    QueryDef(
      "hc_executive_summary",
      s"""SELECT COUNT(DISTINCT a.patient_id) AS unique_patients_served,
         |       COUNT(DISTINCT a.appointment_id) AS total_appointments,
         |       CAST(SUM(CASE WHEN a.status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS completed_appointments,
         |       ROUND(SUM(CASE WHEN a.status = 'completed' THEN 1 ELSE 0 END) * 100.0 / CAST(COUNT(a.appointment_id) AS DOUBLE), 1) AS completion_rate,
         |       CAST(SUM(CASE WHEN a.status = 'no_show' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
         |       ROUND(SUM(CASE WHEN a.status = 'no_show' THEN 1 ELSE 0 END) * 100.0 / CAST(COUNT(a.appointment_id) AS DOUBLE), 1) AS no_show_rate,
         |       COUNT(DISTINCT v.visit_id) AS total_visits,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         |       ${moneyAvgSql("v.total_charge")} AS avg_revenue_per_visit,
         |       COUNT(DISTINCT v.doctor_id) AS active_doctors
         |FROM $A a LEFT JOIN $V v ON a.appointment_id = v.appointment_id AND v.$NotDel
         |WHERE a.$NotDel
         |  AND a.appointment_date >= DATE '$D30' AND a.appointment_date <= DATE '$Now'""".stripMargin)((s, _) =>
      HealthcareQueries.executiveSummary(snap(s), Now)),

    QueryDef(
      "hc_data_quality",
      s"""SELECT 'patients_missing_name' AS check_name,
         |       CAST(SUM(CASE WHEN first_name IS NULL OR last_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count FROM $P
         |UNION ALL SELECT 'patients_missing_dob',
         |       CAST(SUM(CASE WHEN date_of_birth IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM $P
         |UNION ALL SELECT 'appointments_missing_date',
         |       CAST(SUM(CASE WHEN appointment_date IS NULL OR appointment_time IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM $A
         |UNION ALL SELECT 'visits_missing_charge',
         |       CAST(SUM(CASE WHEN total_charge IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM $V
         |ORDER BY check_name""".stripMargin)((s, _) =>
      HealthcareQueries.dataQualityChecks(snap(s))),

    /** The reference's snapshot eyeball check (sql/2.verify_snapshot.sql:
      * 51-83, SELECT * … LIMIT 10 shapes) with a deterministic order — the
      * full row including CDC metadata columns, hash-gated.
      */
    QueryDef(
      "hc_sample_patients",
      s"SELECT * FROM $P ORDER BY patient_id LIMIT 10")((s, _) =>
      HealthcareData.tables(s).patients.orderBy("patient_id").limit(10)),

    /** PII masking for downstream/training exports: local-part-stripped
      * email, last-4-only phone. Pure string/regex ops chosen for exact
      * cross-engine parity (no lookaround, no backrefs).
      */
    QueryDef(
      "hc_pii_masked",
      s"""SELECT patient_id,
         |       regexp_replace(email, '^[^@]+', '***') AS masked_email,
         |       CASE WHEN length(phone) >= 4
         |            THEN repeat('*', length(phone) - 4) || substr(phone, length(phone) - 3, 4)
         |            ELSE repeat('*', length(phone)) END AS masked_phone,
         |       city, state
         |FROM $P WHERE $NotDel
         |ORDER BY patient_id""".stripMargin)((s, _) => {
      HealthcareData.tables(s).patients
        .filter(s"${graft.cdc.CdcApplier.MetaDeleted} = false")
        .selectExpr(
          "patient_id",
          "regexp_replace(email, '^[^@]+', '***') AS masked_email",
          // short phones: Spark treats substring pos <= 0 as 1 while DuckDB
          // yields fewer chars — guard so both engines mask the whole value
          """CASE WHEN length(phone) >= 4
             THEN concat(repeat('*', length(phone) - 4), substring(phone, length(phone) - 3, 4))
             ELSE repeat('*', length(phone)) END AS masked_phone""",
          "city", "state")
        .orderBy("patient_id")
    }),

    // ---- semantic-model verified queries (EP3) ----
    QueryDef(
      "sm_total_appointments",
      s"""SELECT COUNT(*) AS total_appointments,
         |       COUNT(DISTINCT patient_id) AS unique_patients,
         |       COUNT(DISTINCT doctor_id) AS unique_doctors,
         |       MIN(appointment_date) AS earliest,
         |       MAX(appointment_date) AS latest
         |FROM $AL WHERE $NotDel""".stripMargin)((s, _) =>
      semantic(s, "total_appointments_summary")),

    QueryDef(
      "sm_appointments_modified_recently",
      s"""SELECT status, COUNT(*) AS modified_count
         |FROM $AL
         |WHERE $NotDel AND _snowflake_updated_at IS NOT NULL
         |GROUP BY status""".stripMargin)((s, _) =>
      semantic(s, "appointments_modified_recently")),

    QueryDef(
      "sm_revenue_by_doctor",
      s"""SELECT d.doctor_id, d.first_name, d.last_name, d.specialization, d.department,
         |       COUNT(v.visit_id) AS total_visits,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         |       MIN(v.visit_date) AS first_visit, MAX(v.visit_date) AS last_visit
         |FROM $DL d LEFT JOIN $VL v ON d.doctor_id = v.doctor_id AND v.$NotDel
         |WHERE d.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization, d.department""".stripMargin)((s, _) =>
      semantic(s, "revenue_by_doctor")),

    // A query the reference's agent setup would COMPOSE, not transcribe:
    // dimensions from two tables through a declared relationship, a filter,
    // and two metrics — compiled by the generic QueryBuilder.compile path.
    QueryDef(
      "sm_generic_type_by_specialization",
      s"""SELECT d.specialization, a.appointment_type,
         |       COUNT(*) AS n_appointments,
         |       COUNT(DISTINCT a.patient_id) AS unique_patients
         |FROM $AL a LEFT JOIN $DL d ON a.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE a.$NotDel AND a.status <> 'CANCELLED'
         |GROUP BY d.specialization, a.appointment_type""".stripMargin)((s, _) =>
      semanticCompile(s, SemanticRequest(
        root = "appointments",
        relationships = Seq("appointments_to_doctors"),
        dimensions = Seq(
          SemRef("doctors", "specialization"),
          SemRef("appointments", "appointment_type")),
        metrics = Seq(
          SemMetric("count_star", None, "n_appointments"),
          SemMetric("count_distinct", Some(SemRef("appointments", "patient_id")), "unique_patients")),
        filters = Seq(
          SemFilter(SemRef("appointments", "status"), "ne", Some("CANCELLED"))),
        orderBy = Seq(
          SemOrder("specialization", nullsLast = true),
          SemOrder("appointment_type", nullsLast = true))))),

    // Model-declared NAMED FILTER + synonym-addressed refs: the request
    // refers to 'medical_condition' / 'revenue' / 'expensive_visits', all
    // synonyms the YAML declares; the WHERE comes from the model's
    // `filters:` block, not from the request.
    QueryDef(
      "sm_named_filter_high_value",
      s"""SELECT diagnosis, COUNT(*) AS visit_count,
         |       CAST(SUM(CAST(total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
         |FROM $VL
         |WHERE $NotDel AND total_charge >= 200
         |GROUP BY diagnosis""".stripMargin)((s, _) =>
      semanticCompile(s, SemanticRequest(
        root = "visits",
        dimensions = Seq(SemRef("visits", "medical_condition")),
        metrics = Seq(
          SemMetric("count_star", None, "visit_count"),
          SemMetric("sum_money", Some(SemRef("visits", "revenue")), "total_revenue")),
        namedFilters = Seq(SemRef("visits", "expensive_visits")),
        orderBy = Seq(
          SemOrder("total_revenue", desc = true, nullsLast = true),
          SemOrder("diagnosis"))))),

    // ----- GDPR erasure: right-to-be-forgotten cascade audit -----
    // Erasing a patient is NOT one DELETE: PII persists in the patient
    // row, every appointment/visit referencing them (including
    // soft-deleted rows — the _snowflake_deleted flag hides rows from
    // queries, it does not remove PII), and the append-only CDC journal,
    // whose `after` images embed the patient's data and whose DELETE
    // tombstones carry no `after` at all — so journal attribution must go
    // by KEY (every journal event for an appointment/visit the patient
    // ever owned), not by payload inspection. This query runs the full
    // cascade as one plan and emits a per-store audit: rows before,
    // rows erased, rows after, and — recomputed FROM the erased result,
    // not asserted — the residual references remaining (must be 0).
    //
    // Scale shape: direct stores flag by a pushed-down predicate; the
    // journals flag via a broadcast key-set join (the erased key set is
    // one patient's keys — always broadcastable); each audit row is a
    // pair of 1-row aggregates crossJoined (bounded by construction). At
    // 100 TB the same plan rewrites only the files whose row groups
    // contain hits — the key-set join IS the pruning predicate.
    QueryDef(
      "hc_gdpr_erasure",
      s"""WITH aj AS (SELECT * FROM read_parquet('${HealthcareData.Root}/store/appointments_journal/*/*.parquet')),
         |vj AS (SELECT * FROM read_parquet('${HealthcareData.Root}/store/visits_journal/*/*.parquet')),
         |ak AS (SELECT DISTINCT CAST(appointment_id AS VARCHAR) AS k FROM $AL WHERE patient_id = 41
         |       UNION SELECT DISTINCT CAST(key AS VARCHAR) FROM aj
         |       WHERE CAST(json_extract_string(after, '$$.patient_id') AS BIGINT) = 41),
         |vk AS (SELECT DISTINCT CAST(visit_id AS VARCHAR) AS k FROM $VL WHERE patient_id = 41
         |       UNION SELECT DISTINCT CAST(key AS VARCHAR) FROM vj
         |       WHERE CAST(json_extract_string(after, '$$.patient_id') AS BIGINT) = 41),
         |pf AS (SELECT patient_id = 41 AS hit FROM $P),
         |af AS (SELECT patient_id = 41 AS hit FROM $AL),
         |vf AS (SELECT patient_id = 41 AS hit FROM $VL),
         |ajf AS (SELECT (ak.k IS NOT NULL) AS hit FROM aj LEFT JOIN ak ON CAST(aj.key AS VARCHAR) = ak.k),
         |vjf AS (SELECT (vk.k IS NOT NULL) AS hit FROM vj LEFT JOIN vk ON CAST(vj.key AS VARCHAR) = vk.k)
         |SELECT * FROM (
         |  SELECT 'appointments' AS table_name,
         |         (SELECT COUNT(*) FROM af) AS rows_before,
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM af) AS erased,
         |         (SELECT COUNT(*) FROM af WHERE NOT hit) AS rows_after,
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM af WHERE NOT hit) AS residual
         |  UNION ALL
         |  SELECT 'appointments_journal',
         |         (SELECT COUNT(*) FROM ajf),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ajf),
         |         (SELECT COUNT(*) FROM ajf WHERE NOT hit),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ajf WHERE NOT hit)
         |  UNION ALL
         |  SELECT 'patients',
         |         (SELECT COUNT(*) FROM pf),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM pf),
         |         (SELECT COUNT(*) FROM pf WHERE NOT hit),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM pf WHERE NOT hit)
         |  UNION ALL
         |  SELECT 'visits',
         |         (SELECT COUNT(*) FROM vf),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM vf),
         |         (SELECT COUNT(*) FROM vf WHERE NOT hit),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM vf WHERE NOT hit)
         |  UNION ALL
         |  SELECT 'visits_journal',
         |         (SELECT COUNT(*) FROM vjf),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM vjf),
         |         (SELECT COUNT(*) FROM vjf WHERE NOT hit),
         |         (SELECT CAST(COALESCE(SUM(CASE WHEN hit THEN 1 ELSE 0 END), 0) AS BIGINT) FROM vjf WHERE NOT hit)
         |) ORDER BY table_name""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      HealthcareData.ensure(s)
      val root = HealthcareData.Root
      val pid = 41L
      val patients = s.read.parquet(s"$root/patients")
      val apptLive = s.read.parquet(s"$root/appointments_live")
      val visitsLive = s.read.parquet(s"$root/visits_live")
      val aj = s.read.parquet(s"$root/store/appointments_journal")
      val vj = s.read.parquet(s"$root/store/visits_journal")

      // one audit row from a flagged store: before/erased over the full
      // set, after/residual recomputed over the erased result. Both sides
      // are 1-row aggregates — the crossJoin is 1×1 by construction.
      def audit(name: String, flagged: DataFrame): DataFrame = {
        def counts(df: DataFrame, total: String, hits: String) = df.agg(
          count(lit(1)).as(total),
          coalesce(sum(when(col("_gdpr_hit"), 1L).otherwise(0L)), lit(0L)).as(hits))
        counts(flagged, "rows_before", "erased")
          .crossJoin(counts(flagged.filter(!col("_gdpr_hit")), "rows_after", "residual"))
          .select(lit(name).as("table_name"), col("rows_before"), col("erased"),
            col("rows_after"), col("residual"))
      }
      def direct(df: DataFrame) = df.withColumn("_gdpr_hit", col("patient_id") === pid)
      // journal attribution by KEY: every event for an entity the patient
      // ever owned — catches DELETE tombstones whose payload has no PII
      // link. The key set is one patient's entities: broadcast.
      def journalFlag(j: DataFrame, keys: DataFrame) = j
        .withColumn("_jk", col("key").cast("string"))
        .join(broadcast(keys), j("key").cast("string") === keys("_k"), "left")
        .withColumn("_gdpr_hit", col("_k").isNotNull)
      val apptKeys = apptLive.filter(col("patient_id") === pid)
        .select(col("appointment_id").cast("string").as("_k"))
        .union(aj.filter(get_json_object(col("after"), "$.patient_id").cast("long") === pid)
          .select(col("key").cast("string").as("_k")))
        .distinct()
      val visitKeys = visitsLive.filter(col("patient_id") === pid)
        .select(col("visit_id").cast("string").as("_k"))
        .union(vj.filter(get_json_object(col("after"), "$.patient_id").cast("long") === pid)
          .select(col("key").cast("string").as("_k")))
        .distinct()
      audit("patients", direct(patients))
        .unionByName(audit("appointments", direct(apptLive)))
        .unionByName(audit("visits", direct(visitsLive)))
        .unionByName(audit("appointments_journal", journalFlag(aj, apptKeys)))
        .unionByName(audit("visits_journal", journalFlag(vj, visitKeys)))
        .orderBy("table_name")
    },

    // ----- Journal time travel: table state AS OF an arbitrary LSN -----
    // The payoff of the append-only journal (S5) beyond auditing: rebuild
    // the appointments table as it stood at ANY point in the CDC stream —
    // snapshot rows not yet touched, plus each touched key's latest
    // journal event at lsn ≤ L (latest-wins), minus keys whose winning op
    // is DELETE. asOf=16 is mid-demo by design: it exercises inserts,
    // a multi-update key (174 resolves to its lsn-14 state, not lsn-8),
    // one APPLIED delete (key 3, lsn 16) and one NOT-yet-applied delete
    // (key 7, lsn 17 — still visible).
    //
    // Scale shape: the journal is hive-partitioned by commit date, so an
    // AS-OF bounded replay prunes partitions before reading; the winner
    // pick is one key-partitioned window over the (bounded) journal slice,
    // and the snapshot join is a key-keyed LEFT ANTI — no full-table
    // rewrite, no driver loop. Ref: sql/3.live_appointments.sql:414 (the
    // journal records every event; this query is why you keep it).
    QueryDef(
      "hc_time_travel_asof",
      s"""WITH j AS (SELECT * FROM read_parquet('${HealthcareData.Root}/store/appointments_journal/*/*.parquet')
         |           WHERE lsn <= 16),
         |win AS (SELECT * FROM (
         |          SELECT key, op, after,
         |                 ROW_NUMBER() OVER (PARTITION BY key ORDER BY lsn DESC) AS rn
         |          FROM j) WHERE rn = 1),
         |surv AS (SELECT key AS appointment_id,
         |                CAST(json_extract_string(after, '$$.patient_id') AS BIGINT) AS patient_id,
         |                CAST(json_extract_string(after, '$$.doctor_id') AS BIGINT) AS doctor_id,
         |                CAST(json_extract_string(after, '$$.appointment_date') AS DATE) AS appointment_date,
         |                json_extract_string(after, '$$.status') AS status,
         |                json_extract_string(after, '$$.appointment_type') AS appointment_type
         |         FROM win WHERE op <> 'DELETE'),
         |unt AS (SELECT appointment_id, patient_id, doctor_id, appointment_date,
         |               status, appointment_type
         |        FROM $A
         |        WHERE $NotDel AND appointment_id NOT IN (SELECT key FROM win))
         |SELECT * FROM unt UNION ALL SELECT * FROM surv
         |ORDER BY appointment_id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      HealthcareData.ensure(s)
      val root = HealthcareData.Root
      val asOf = 16L
      val snap = s.read.parquet(s"$root/appointments")
      val j = s.read.parquet(s"$root/store/appointments_journal")
        .filter(col("lsn") <= asOf)
      val w = Window.partitionBy("key").orderBy(col("lsn").desc)
      val win = j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("key", "op", "after")
      val surv = win.filter(col("op") =!= "DELETE")
        .select(col("key").cast("long").as("appointment_id"),
          get_json_object(col("after"), "$.patient_id").cast("long").as("patient_id"),
          get_json_object(col("after"), "$.doctor_id").cast("long").as("doctor_id"),
          get_json_object(col("after"), "$.appointment_date").cast("date").as("appointment_date"),
          get_json_object(col("after"), "$.status").as("status"),
          get_json_object(col("after"), "$.appointment_type").as("appointment_type"))
      val unt = snap
        .filter(!col("_snowflake_deleted"))
        .join(win.select(col("key").cast("long").as("appointment_id")),
          Seq("appointment_id"), "left_anti")
        .select("appointment_id", "patient_id", "doctor_id",
          "appointment_date", "status", "appointment_type")
      unt.unionByName(surv).orderBy("appointment_id")
    })
}
