package graft.semantic

import graft.QueryDef
import graft.analytics.HealthcareData
import org.apache.spark.sql.SparkSession

/** The reference's ACTUAL published semantic model, end to end: parse the
  * full 649-line Cortex-Analyst YAML
  * (/root/reference/semantic-models/healthcare_cdc_semantic_model.yaml —
  * public content, parsed at runtime, never copied), then compile each of
  * its three `verified_queries` (yaml:586-594, 600-617, 623-646) through the
  * generic [[QueryBuilder.compile]] path and gate them against a DuckDB
  * oracle restating the verified SQL.
  *
  * This is the fidelity step beyond the condensed in-repo model the `sm_*`
  * queries exercise: the REAL input has Postgres-quoted exprs
  * (`'"appointment_id"'`), upper-cased CDC metadata columns and relationship
  * columns, typed precision suffixes (`NUMBER(38,0)`, `TIMESTAMP_NTZ(9)`),
  * 4 tables × ~60 columns with synonym blocks (including genuinely ambiguous
  * synonyms — `last_modified` maps to two appointments columns), a 5-edge
  * relationship graph, and provenance-stamped verified queries. Loading it
  * proves the parser; compiling the verified queries proves the builder
  * against the model as published.
  */
object RefModelQueries {

  /** The reference's model, read from the reference checkout at runtime. */
  val ModelPath =
    "/root/reference/semantic-models/healthcare_cdc_semantic_model.yaml"

  private lazy val model = SemanticModel.loadFile(ModelPath)

  private val Now = HealthcareData.Now
  private def pq(t: String) = HealthcareData.pq(t)
  private val AL = pq("appointments_live")
  private val VL = pq("visits_live")
  private val DL = pq("doctors_live")
  private val NotDel = "_snowflake_deleted = FALSE"

  /** Queries run on the CDC-synced state, the way the reference's agent
    * does; the semantic names come from the model's `base_table` entries
    * (unquoted `"appointments"` → appointments, etc.).
    */
  private def builder(s: SparkSession): QueryBuilder = {
    val t = HealthcareData.liveTables(s)
    val byName = Map(
      "patients" -> t.patients, "doctors" -> t.doctors,
      "appointments" -> t.appointments, "visits" -> t.visits)
    new QueryBuilder(model, byName(_))
  }

  val defs: Seq[QueryDef] = Seq(

    // verified query 1, "How many total appointments do we have?"
    // (yaml:586-594): COUNT(appointment_id) + MIN/MAX(appointment_date)
    // under the always-on soft-delete exclusion.
    QueryDef(
      "sm_ref_total_appointments",
      s"""SELECT COUNT(appointment_id) AS total_appointments,
         |       MIN(appointment_date) AS start_date,
         |       MAX(appointment_date) AS end_date
         |FROM $AL WHERE $NotDel""".stripMargin)((s, _) =>
      builder(s).compile(SemanticRequest(
        root = "appointments",
        metrics = Seq(
          SemMetric("count", Some(SemRef("appointments", "appointment_id")), "total_appointments"),
          SemMetric("min", Some(SemRef("appointments", "appointment_date")), "start_date"),
          SemMetric("max", Some(SemRef("appointments", "appointment_date")), "end_date"))))),

    // verified query 2, "Show appointments modified today via CDC"
    // (yaml:600-617): dimension-only projection with
    // TO_DATE(_snowflake_updated_at) = CURRENT_DATE (frozen at Now) and
    // DESC NULLS LAST ordering on the CDC update stamp. The builder
    // surfaces the model's canonical (upper-case) CDC column name; the
    // boundary rename to updated_at is ours.
    QueryDef(
      "sm_ref_modified_today",
      s"""SELECT appointment_id, patient_id, doctor_id, appointment_date,
         |       appointment_time, status, reason_for_visit, appointment_type,
         |       _snowflake_updated_at AS updated_at
         |FROM $AL
         |WHERE $NotDel AND CAST(_snowflake_updated_at AS DATE) = DATE '$Now'
         |ORDER BY updated_at DESC, appointment_id""".stripMargin)((s, _) =>
      builder(s).compile(SemanticRequest(
        root = "appointments",
        dimensions = Seq(
          SemRef("appointments", "appointment_id"),
          SemRef("appointments", "patient_id"),
          SemRef("appointments", "doctor_id"),
          SemRef("appointments", "appointment_date"),
          SemRef("appointments", "appointment_time"),
          SemRef("appointments", "status"),
          SemRef("appointments", "reason_for_visit"),
          SemRef("appointments", "appointment_type"),
          SemRef("appointments", "_SNOWFLAKE_UPDATED_AT")),
        filters = Seq(
          SemFilter(SemRef("appointments", "_SNOWFLAKE_UPDATED_AT"), "eq_date", Some(Now))),
        orderBy = Seq(
          SemOrder("_SNOWFLAKE_UPDATED_AT", desc = true, nullsLast = true),
          SemOrder("appointment_id"))))
        .withColumnRenamed("_SNOWFLAKE_UPDATED_AT", "updated_at")),

    // verified query 3, "Calculate revenue by doctor" (yaml:623-646):
    // visits LEFT OUTER JOIN doctors through the model's declared
    // visits_to_doctors relationship (yaml:577-582), doctor dimensions,
    // MIN/MAX(visit_date) + SUM(total_charge) ordered by revenue DESC NULLS
    // LAST. The soft-delete exclusion applies below the join (J4), which on
    // this data equals the verified SQL's WHERE on both sides.
    QueryDef(
      "sm_ref_revenue_by_doctor",
      s"""SELECT d.doctor_id, d.first_name, d.last_name, d.specialization,
         |       d.department,
         |       MIN(v.visit_date) AS start_date, MAX(v.visit_date) AS end_date,
         |       CAST(SUM(CAST(v.total_charge AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
         |FROM $VL v LEFT JOIN $DL d ON v.doctor_id = d.doctor_id AND d.$NotDel
         |WHERE v.$NotDel
         |GROUP BY d.doctor_id, d.first_name, d.last_name, d.specialization,
         |         d.department""".stripMargin)((s, _) =>
      builder(s).compile(SemanticRequest(
        root = "visits",
        relationships = Seq("visits_to_doctors"),
        dimensions = Seq(
          SemRef("doctors", "doctor_id"),
          SemRef("doctors", "first_name"),
          SemRef("doctors", "last_name"),
          SemRef("doctors", "specialization"),
          SemRef("doctors", "department")),
        metrics = Seq(
          SemMetric("min", Some(SemRef("visits", "visit_date")), "start_date"),
          SemMetric("max", Some(SemRef("visits", "visit_date")), "end_date"),
          SemMetric("sum_money", Some(SemRef("visits", "total_charge")), "total_revenue")),
        orderBy = Seq(
          SemOrder("total_revenue", desc = true, nullsLast = true),
          SemOrder("doctor_id"))))),

    // ----- synonym addressing through the REAL model, oracle-gated -----
    // Every column reference below is a SYNONYM from the published YAML,
    // never a canonical name: `area_of_practice`→specialization,
    // `taking_new_patients`→accepting_new_patients (the filter),
    // `tenure`→years_of_experience (yaml doctors block). The compile path
    // must resolve each against the full 649-line model (where genuinely
    // ambiguous synonyms like appointments.`last_modified` exist and are
    // refused), apply the boolean filter through the declared
    // BOOLEAN data_type, and surface output columns under CANONICAL names —
    // the oracle restates the result in those canonical names.
    QueryDef(
      "sm_ref_syn_accepting_by_specialty",
      s"""SELECT specialization, COUNT(*) AS n_doctors,
         |       MAX(years_of_experience) AS max_tenure
         |FROM $DL WHERE $NotDel AND accepting_new_patients = TRUE
         |GROUP BY specialization
         |ORDER BY specialization""".stripMargin)((s, _) =>
      builder(s).compile(SemanticRequest(
        root = "doctors",
        dimensions = Seq(SemRef("doctors", "area_of_practice")),
        metrics = Seq(
          SemMetric("count_star", None, "n_doctors"),
          SemMetric("max", Some(SemRef("doctors", "tenure")), "max_tenure")),
        filters = Seq(
          SemFilter(SemRef("doctors", "taking_new_patients"), "eq", Some("true"))),
        orderBy = Seq(SemOrder("specialization"))))),

    // Same discipline on appointments: `visit_type`→appointment_type (dim),
    // `state`→status (filter; `state` is unambiguous — the model's status
    // block declares it, nothing else does) — with a ne-op predicate typed
    // as VARCHAR by the declared data_type.
    QueryDef(
      "sm_ref_syn_active_by_type",
      s"""SELECT appointment_type, COUNT(*) AS n_appointments
         |FROM $AL WHERE $NotDel AND status <> 'cancelled'
         |GROUP BY appointment_type
         |ORDER BY appointment_type""".stripMargin)((s, _) =>
      builder(s).compile(SemanticRequest(
        root = "appointments",
        dimensions = Seq(SemRef("appointments", "visit_type")),
        metrics = Seq(SemMetric("count_star", None, "n_appointments")),
        filters = Seq(
          SemFilter(SemRef("appointments", "state"), "ne", Some("cancelled"))),
        orderBy = Seq(SemOrder("appointment_type"))))))
}
