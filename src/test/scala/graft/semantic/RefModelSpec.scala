package graft.semantic

/** The REAL reference model (649-line Cortex-Analyst YAML) through
  * [[SemanticModel.load]] — the parser-fidelity gate the condensed in-repo
  * model can't provide. Query-level correctness of the three verified
  * queries is gated by the `sm_ref_*` DuckDB oracles; this spec pins the
  * parse itself.
  */
class RefModelSpec extends graft.SparkSpec {

  private lazy val model = SemanticModel.loadFile(RefModelQueries.ModelPath)

  test("parses the full reference YAML: tables, columns, keys, synonyms") {
    assert(model.name == "HEALTHCARE_DATA_INTELLIGENCE")
    assert(model.tables.map(_.name).toSet ==
      Set("patients", "doctors", "appointments", "visits"))

    // Postgres-quoted exprs ('"appointment_id"') unquote to plain columns;
    // unquoted upper-case CDC metadata exprs survive as-is
    val appts = model.table("appointments")
    assert(appts.baseTable == "appointments") // from quoted base_table.table
    assert(appts.dimensions.find(_.name == "appointment_id").get.expr == "appointment_id")
    assert(appts.dimensions.find(_.name == "_SNOWFLAKE_DELETED").get.expr == "_SNOWFLAKE_DELETED")
    assert(appts.primaryKey == Seq("APPOINTMENT_ID"))

    // synonym blocks load (appointments declares 9 table-level synonyms)
    assert(appts.synonyms.contains("bookings"))
    assert(appts.dimensions.find(_.name == "status").get.synonyms.contains("standing"))

    // typed precision suffixes survive in data_type
    assert(model.table("visits").facts.map(_.name) == Seq("total_charge"))
    assert(model.table("visits").facts.head.dataType == "NUMBER(10,2)")
    assert(model.table("doctors").facts.map(_.name) == Seq("years_of_experience"))
  }

  test("relationship graph: 5 edges, default left_outer, upper-case columns") {
    assert(model.relationships.size == 5)
    val v2d = model.relationship("visits_to_doctors")
    assert(v2d.leftTable == "visits" && v2d.rightTable == "doctors")
    assert(v2d.joinType == "left_outer") // reference declares no join_type
    // the reference mixes cases even within one edge (lower-case left,
    // upper-case right) — preserved verbatim; Spark resolution is
    // case-insensitive where it matters
    assert(v2d.columns == Seq(("doctor_id", "DOCTOR_ID")))
    assert(model.relationship("appointments_to_patients").columns ==
      Seq(("patient_id", "PATIENT_ID")))
  }

  test("verified queries load with provenance stamps") {
    assert(model.verifiedQueries.size == 3)
    val revenue = model.verifiedQueries.find(_.name == "Calculate revenue by doctor").get
    assert(revenue.sql.contains("LEFT OUTER JOIN"))
    assert(revenue.verifiedBy.nonEmpty)
    assert(revenue.verifiedAt == 1759937325L)
    assert(model.verifiedQueries.count(_.useAsOnboardingQuestion) == 1)
  }

  test("ambiguous synonyms load but are refused as addresses") {
    // the reference gives last_modified/last_updated to BOTH
    // _SNOWFLAKE_UPDATED_AT and updated_at in appointments — the model must
    // LOAD (it is the published artifact), and resolution by that synonym
    // must refuse rather than pick by declaration order
    val amb = model.ambiguousAddresses
    assert(amb.getOrElse("appointments", Set.empty).contains("last_modified"))
    // a minimal frame: compile() touches the root table (for the soft-delete
    // filter) before resolving dimensions, so the source must be real
    val frame = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_snowflake_deleted",
          org.apache.spark.sql.types.BooleanType))))
    val qb = new QueryBuilder(model, _ => frame)
    val e = intercept[IllegalArgumentException] {
      qb.compile(SemanticRequest(
        root = "appointments",
        dimensions = Seq(SemRef("appointments", "last_modified"))))
    }
    assert(e.getMessage.contains("ambiguous"))
    // an unambiguous synonym of the same column still resolves
    assert(model.table("appointments").timeDimensions
      .find(_.name == "_SNOWFLAKE_UPDATED_AT").get.synonyms.contains("updated_timestamp"))
  }
}
