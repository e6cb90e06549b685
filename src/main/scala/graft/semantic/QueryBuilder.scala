package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic query building over a [[SemanticModel]] (reference EP3).
  *
  * No natural-language understanding is in scope (SURVEY §3 EP3) — the
  * contract is: given the model and a verified-query name, produce a
  * DataFrame whose results match the verified SQL. The builder supplies the
  * three guarantees the reference's agent setup encodes:
  *   1. the soft-delete filter `_snowflake_deleted = FALSE` is ALWAYS
  *      injected (healthcare_cdc_semantic_model.yaml:594,614,637-638);
  *   2. joins resolve through declared relationships only;
  *   3. ordering uses NULLS LAST where the verified SQL does.
  */
final class QueryBuilder(model: SemanticModel, source: String => DataFrame) {

  private val Deleted = "_snowflake_deleted"
  private val Updated = "_snowflake_updated_at"

  /** A semantic table as a DataFrame with the soft-delete filter injected. */
  def table(name: String): DataFrame = {
    val t = model.table(name)
    source(t.baseTable).filter(col(Deleted) === false)
  }

  /** Join two semantic tables through a declared relationship. Extra
    * predicates ride in the ON clause (preserving left rows on outer joins —
    * the J4 rule).
    */
  def joined(relName: String, extraOn: Column = lit(true)): DataFrame = {
    val r = model.relationship(relName)
    val left = table(r.leftTable).as("l")
    val right = table(r.rightTable).as("r")
    val cond = r.columns.map { case (lc, rc) => col(s"l.$lc") === col(s"r.$rc") }
      .reduce(_ && _) && extraOn
    val joinType = r.joinType match {
      case "left_outer" => "left"
      case other => other
    }
    left.join(right, cond, joinType)
  }

  /** Execute a verified query by name — the golden contract. */
  def verified(name: String): DataFrame = name match {
    case "total_appointments_summary" =>
      table("appointments").agg(
        count(lit(1)).as("total_appointments"),
        countDistinct(col("patient_id")).as("unique_patients"),
        countDistinct(col("doctor_id")).as("unique_doctors"),
        min(col("appointment_date")).as("earliest"),
        max(col("appointment_date")).as("latest"))

    case "appointments_modified_recently" =>
      table("appointments")
        .filter(col(Updated).isNotNull)
        .groupBy("status")
        .agg(count(lit(1)).as("modified_count"))
        .orderBy(col("modified_count").desc_nulls_last, col("status"))

    case "revenue_by_doctor" =>
      joined("visits_to_doctors")
        .groupBy(col("l.doctor_id"), col("l.first_name"), col("l.last_name"),
          col("l.specialization"), col("l.department"))
        .agg(
          count(col("r.visit_id")).as("total_visits"),
          // exact decimal sum surfaced as DOUBLE (oracle-parity money rule)
          sum(col("r.total_charge").cast("decimal(18,2)")).cast("double").as("total_revenue"),
          min(col("r.visit_date")).as("first_visit"),
          max(col("r.visit_date")).as("last_visit"))
        .select(
          col("doctor_id"), col("first_name"), col("last_name"),
          col("specialization"), col("department"),
          col("total_visits"), col("total_revenue"), col("first_visit"), col("last_visit"))
        .orderBy(col("total_revenue").desc_nulls_last, col("doctor_id"))

    case other =>
      throw new NoSuchElementException(s"no builder for verified query $other")
  }
}
