package graft.semantic

import graft.SparkSpec
import graft.analytics.{HealthcareQueries, HealthcareTables}
import graft.fixtures.HealthcareFixtures
import org.apache.spark.sql.functions._

/** EP3 golden contract: the YAML loads into the model graph and each
  * verified query's builder output matches independently-written SQL over
  * the same tables (SURVEY §5.5).
  */
class SemanticModelSpec extends SparkSpec {

  private lazy val model = SemanticModel.loadResource("/healthcare_semantic_model.yaml")
  private lazy val tables = HealthcareFixtures.snapshotTables(spark)
  private lazy val qb = new QueryBuilder(model, tables(_))

  test("YAML loads the full model graph") {
    assert(model.name == "healthcare_cdc")
    assert(model.tables.map(_.name).toSet ==
      Set("patients", "doctors", "appointments", "visits"))
    assert(model.table("visits").facts.map(_.name) == Seq("total_charge"))
    assert(model.table("appointments").primaryKey == Seq("appointment_id"))
    assert(model.relationships.size == 4)
    assert(model.relationship("visits_to_doctors").joinType == "left_outer")
    assert(model.verifiedQueries.size == 3)
  }

  test("descriptive metadata loads: descriptions, sample values, provenance") {
    // column-level description + sample_values (the reference model's
    // agent-grounding surface, healthcare_cdc_semantic_model.yaml:29-40)
    val status = model.table("appointments").dimensions.find(_.name == "status").get
    assert(status.description.nonEmpty)
    assert(status.sampleValues.contains("no_show"))
    assert(status.sampleValues.size == 7)
    val charge = model.table("visits").facts.find(_.name == "total_charge").get
    assert(charge.description.contains("dollars"))
    assert(charge.sampleValues == Seq("150.00", "270.00"))
    // table-level description
    assert(model.table("patients").description.nonEmpty)
    // verified-query provenance (verified_by/verified_at/onboarding flag)
    val vq = model.verifiedQueries.find(_.name == "total_appointments_summary").get
    assert(vq.verifiedBy == "graft-maintainers")
    assert(vq.verifiedAt > 0L)
    assert(vq.useAsOnboardingQuestion)
    assert(model.verifiedQueries.count(_.useAsOnboardingQuestion) == 1)
    // the agent-facing rendering carries the metadata through
    val doc = model.documentation
    assert(doc.contains("## table visits"))
    assert(doc.contains("no_show"))
    assert(doc.contains("verified by graft-maintainers"))
    assert(doc.contains("high_value_visits"))
  }

  test("verified: total_appointments_summary") {
    val out = qb.verified("total_appointments_summary").collect()(0)
    assert(out.getAs[Long]("total_appointments") == 170)
    assert(out.getAs[Long]("unique_doctors") == 10)
  }

  test("verified: appointments_modified_recently is empty right after snapshot") {
    assert(qb.verified("appointments_modified_recently").count() == 0)
  }

  test("verified: revenue_by_doctor matches the reference SQL via spark.sql") {
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    // independent implementation: the verified SQL itself (Spark SQL dialect)
    val expected = spark.sql(
      """SELECT d.doctor_id,
        |       COUNT(v.visit_id) AS total_visits,
        |       SUM(v.total_charge) AS total_revenue
        |FROM doctors d LEFT OUTER JOIN visits v
        |  ON d.doctor_id = v.doctor_id AND v.`_snowflake_deleted` = FALSE
        |WHERE d.`_snowflake_deleted` = FALSE
        |GROUP BY d.doctor_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.getDecimal(2))))).toMap
    // builder emits total_revenue as DOUBLE (oracle-parity money rule)
    val got = qb.verified("revenue_by_doctor")
      .collect().map(r => r.getAs[Long]("doctor_id") ->
        ((r.getAs[Long]("total_visits"),
          Option(r.get(r.fieldIndex("total_revenue"))).map(_.asInstanceOf[Double])))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (n, rev)) =>
      assert(n == expected(k)._1, s"doctor $k visit count")
      assert(rev.getOrElse(0.0) ==
        expected(k)._2.map(_.doubleValue).getOrElse(0.0), s"doctor $k revenue")
    }
    // ordering: revenue DESC NULLS LAST
    val revs = qb.verified("revenue_by_doctor").collect()
      .map(r => Option(r.get(r.fieldIndex("total_revenue"))).map(_.asInstanceOf[Double]))
    val nonNull = revs.flatten
    assert(nonNull.sameElements(nonNull.sorted(Ordering[Double].reverse)))
    assert(revs.dropWhile(_.isDefined).forall(_.isEmpty))
  }

  test("generic compile: composed request equals hand-written SQL") {
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val expected = spark.sql(
      """SELECT d.specialization, a.appointment_type,
        |       COUNT(*) AS n_appointments,
        |       COUNT(DISTINCT a.patient_id) AS unique_patients
        |FROM appointments a LEFT JOIN doctors d
        |  ON a.doctor_id = d.doctor_id AND d.`_snowflake_deleted` = FALSE
        |WHERE a.`_snowflake_deleted` = FALSE AND a.status <> 'CANCELLED'
        |GROUP BY d.specialization, a.appointment_type""".stripMargin)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val got = qb.compile(SemanticRequest(
      root = "appointments",
      relationships = Seq("appointments_to_doctors"),
      dimensions = Seq(SemRef("doctors", "specialization"), SemRef("appointments", "appointment_type")),
      metrics = Seq(
        SemMetric("count_star", None, "n_appointments"),
        SemMetric("count_distinct", Some(SemRef("appointments", "patient_id")), "unique_patients")),
      filters = Seq(SemFilter(SemRef("appointments", "status"), "ne", Some("CANCELLED"))),
      orderBy = Seq(SemOrder("specialization", nullsLast = true), SemOrder("appointment_type"))))
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("generic compile rejects columns and joins the graph does not declare") {
    intercept[NoSuchElementException] {
      qb.compile(SemanticRequest(
        root = "appointments",
        dimensions = Seq(SemRef("appointments", "no_such_column")),
        metrics = Seq(SemMetric("count_star", None, "n"))))
    }
    intercept[IllegalArgumentException] {
      // visits_to_doctors has left table doctors — not reachable from a
      // join tree rooted at patients
      qb.compile(SemanticRequest(
        root = "patients",
        relationships = Seq("visits_to_doctors"),
        metrics = Seq(SemMetric("count_star", None, "n"))))
    }
  }

  test("soft-delete filter is always injected by the builder") {
    // builder must exclude soft-deleted rows without the caller asking
    val before = qb.verified("total_appointments_summary")
      .collect()(0).getAs[Long]("total_appointments")
    val withDeleted = tables("appointments")
      .withColumn("_snowflake_deleted", col("appointment_id") <= 10)
    val qb2 = new QueryBuilder(model,
      name => if (name == "appointments") withDeleted else tables(name))
    val after = qb2.verified("total_appointments_summary")
      .collect()(0).getAs[Long]("total_appointments")
    assert(before == 170 && after == 160)
  }
}
