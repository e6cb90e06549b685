package graft.fixtures

import graft.model.HealthcareSchema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic reproduction of the reference's seed data
  * (/root/reference sql/0.init_healthcare.sql:114-345): 10 doctors,
  * 100 patients, 170 appointments (150 past + 20 upcoming), 100 visits.
  *
  * The reference seeds with independent `RANDOM()` per CASE branch, so its
  * documented status distribution is approximate (sql/2.verify_snapshot.sql:
  * 132-137 caveat in SURVEY §5). Here every "random" draw is
  * `xxhash64(salt, id) mod n` — fully deterministic and partition-invariant,
  * so the documented expectations become exact test assertions, and the
  * generator is distributed (spark.range → column exprs; no driver loops),
  * which is what lets the same generator emit 10^9 rows at scale.
  *
  * The clock is injectable ("now" defaults to 2025-01-15) per SURVEY §7.4.3.
  */
object HealthcareFixtures {

  val DefaultNow = "2025-01-15"

  private def draw(salt: Int, id: Column, n: Int): Column =
    pmod(xxhash64(lit(salt), id), lit(n))

  private def pick(salt: Int, id: Column, values: Seq[String]): Column = {
    val arr = array(values.map(lit): _*)
    element_at(arr, (draw(salt, id, values.size) + 1).cast("int"))
  }

  def doctors(spark: SparkSession): DataFrame = {
    // 10 doctors, specialization mix of sql/0.init_healthcare.sql:118-128:
    // General Practice ×3, Cardiology ×2, Pediatrics ×2, Orthopedics,
    // Dermatology, Internal Medicine
    val specs = Seq(
      "General Practice", "General Practice", "General Practice",
      "Cardiology", "Cardiology", "Pediatrics", "Pediatrics",
      "Orthopedics", "Dermatology", "Internal Medicine")
    val depts = Seq(
      "Primary Care", "Primary Care", "Primary Care",
      "Cardiology", "Cardiology", "Pediatrics", "Pediatrics",
      "Surgery", "Dermatology", "Internal Medicine")
    val specArr = array(specs.map(lit): _*)
    val deptArr = array(depts.map(lit): _*)
    spark.range(1, 11).select(
      col("id").as("doctor_id"),
      concat(lit("DocFirst"), col("id")).as("first_name"),
      concat(lit("DocLast"), col("id")).as("last_name"),
      element_at(specArr, col("id").cast("int")).as("specialization"),
      element_at(deptArr, col("id").cast("int")).as("department"),
      format_string("555-02%02d", col("id")).as("phone"),
      concat(lit("doc"), col("id"), lit("@clinic.example")).as("email"),
      (lit(7) + draw(1, col("id"), 19)).cast("int").as("years_of_experience"),
      lit(true).as("accepting_new_patients"))
  }

  def patients(spark: SparkSession): DataFrame = {
    val id = col("id")
    // cohorts of sql/0.init_healthcare.sql:131-231: ids 1-80 adults,
    // 81-90 pediatric (2008-2016), 91-100 seniors 1942-1951 all Medicare
    val dob = when(id <= 80, date_add(lit("1955-01-01").cast("date"),
        (draw(2, id, 45 * 365)).cast("int")))
      .when(id <= 90, date_add(lit("2008-01-01").cast("date"),
        (draw(3, id, 9 * 365)).cast("int")))
      .otherwise(date_add(lit("1942-01-01").cast("date"),
        (draw(4, id, 10 * 365)).cast("int")))
    val insurers = Seq("Blue Cross", "Aetna", "United Health", "Cigna", "Humana",
      "Kaiser", "Anthem", "Centene", "Medicaid", "Medicare")
    val insurance = when(id > 90, lit("Medicare")).otherwise(pick(5, id, insurers))
    val states = Seq("CA", "NY", "TX", "FL", "WA", "IL", "MA", "GA", "NC", "AZ")
    spark.range(1, 101).select(
      id.as("patient_id"),
      concat(lit("PatFirst"), id).as("first_name"),
      concat(lit("PatLast"), id).as("last_name"),
      dob.as("date_of_birth"),
      format_string("555-1%03d", id).as("phone"),
      concat(lit("pat"), id, lit("@mail.example")).as("email"),
      concat(id, lit(" Main St")).as("address"),
      pick(6, id, Seq("Springfield", "Riverton", "Lakeside", "Hillview", "Fairmont")).as("city"),
      pick(7, id, states).as("state"),
      insurance.as("insurance_provider"),
      date_add(lit("2022-01-01").cast("date"), draw(8, id, 1000).cast("int"))
        .cast("timestamp_ntz").as("registration_date"))
  }

  /** 170 appointments: ids 1-150 past (now-90d..now-1d), 151-170 upcoming
    * (now+1..now+30). Past status mix: completed 70 %, cancelled 15 %,
    * no_show 10 %, scheduled 5 % (deterministic, exactly these proportions);
    * upcoming: scheduled/confirmed.
    */
  def appointments(spark: SparkSession, now: String = DefaultNow): DataFrame = {
    val id = col("id")
    val past = id <= 150
    val nowD = lit(now).cast("date")
    val date = when(past, date_sub(nowD, (draw(10, id, 90) + 1).cast("int")))
      .otherwise(date_add(nowD, (draw(11, id, 30) + 1).cast("int")))
    // TIME as zero-padded string: 08:00-16:30 on the half hour
    val slot = draw(12, id, 18) // 18 half-hour slots from 08:00
    val time = format_string("%02d:%02d:00",
      (lit(8) + (slot / 2).cast("int")), (pmod(slot, lit(2)) * 30).cast("int"))
    // exact 70/15/10/5 mix: id*37 mod 150 permutes 0..149 (37 coprime to 150),
    // so the buckets have exactly 105/22/15/8 members — a hash draw would
    // only approximate the mix and can leave fewer completed appointments
    // than the 100 visits require
    val statusDraw = pmod(id * 37, lit(150))
    val status = when(!past, when(draw(14, id, 4) === 0, "confirmed").otherwise("scheduled"))
      .when(statusDraw < 105, "completed")
      .when(statusDraw < 127, "cancelled")
      .when(statusDraw < 142, "no_show")
      .otherwise("scheduled")
    val reasons = Seq("Annual physical", "Flu symptoms", "Back pain", "Headache",
      "Blood pressure check", "Diabetes management", "Skin rash", "Joint pain",
      "Chest pain", "Allergies", "Stomach pain", "Fatigue", "Cough",
      "Medication refill", "Follow-up visit")
    val aType = when(draw(16, id, 100) < 60, "routine")
      .when(draw(16, id, 100) < 85, "urgent")
      .when(draw(17, id, 2) === 0, "follow_up").otherwise("annual")
    spark.range(1, 171).select(
      id.as("appointment_id"),
      (draw(18, id, 100) + 1).as("patient_id"),
      (draw(19, id, 10) + 1).as("doctor_id"),
      date.as("appointment_date"),
      time.as("appointment_time"),
      status.as("status"),
      pick(20, id, reasons).as("reason_for_visit"),
      aType.as("appointment_type"),
      (date.cast("timestamp_ntz") - expr("INTERVAL 7 DAYS")).as("created_at"),
      date.cast("timestamp_ntz").as("updated_at"))
  }

  /** One visit per completed appointment, capped at 100
    * (sql/0.init_healthcare.sql:297-345): start = date+time, end = +30 min,
    * charge 75.00–350.00, flags p≈0.30/0.40.
    */
  def visits(spark: SparkSession, now: String = DefaultNow): DataFrame = {
    val appts = appointments(spark, now)
    val completed = appts.filter(col("status") === "completed")
      .orderBy("appointment_id").limit(100)
    val start = to_timestamp(
      concat(col("appointment_date").cast("string"), lit(" "), col("appointment_time")))
      .cast("timestamp_ntz")
    val aid = col("appointment_id")
    completed.select(
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("appointment_id"))
        .cast("long").as("visit_id"),
      aid.as("appointment_id"),
      col("patient_id"),
      col("doctor_id"),
      col("appointment_date").as("visit_date"),
      start.as("visit_start_time"),
      (start + expr("INTERVAL 30 MINUTES")).as("visit_end_time"),
      pick(21, aid, Seq("Hypertension", "Type 2 diabetes", "Acute bronchitis",
        "Migraine", "Lumbar strain", "Dermatitis", "Arthritis", "GERD",
        "Anxiety", "Hyperlipidemia", "Sinusitis", "UTI", "Asthma",
        "Healthy - no issues", "Seasonal allergies")).as("diagnosis"),
      pick(22, aid, Seq("Rest and fluids", "Prescribed medication", "Physical therapy referral",
        "Lifestyle changes discussed", "Specialist referral", "Lab work ordered",
        "Imaging ordered", "Follow-up in 2 weeks", "No treatment needed",
        "Vaccination administered")).as("treatment_notes"),
      (draw(23, aid, 100) < 30).as("follow_up_required"),
      (draw(24, aid, 100) < 40).as("prescription_given"),
      (lit(75.0) + draw(25, aid, 27501).cast("double") / 100.0)
        .cast(DecimalType(10, 2)).as("total_charge"))
  }

  def all(spark: SparkSession, now: String = DefaultNow): Map[String, DataFrame] = Map(
    "patients" -> patients(spark),
    "doctors" -> doctors(spark),
    "appointments" -> appointments(spark, now),
    "visits" -> visits(spark, now))

  /** Snapshot-loaded destination tables (with CDC metadata columns), the
    * post-initial-load state of sql/2.verify_snapshot.sql.
    */
  def snapshotTables(spark: SparkSession, now: String = DefaultNow): Map[String, DataFrame] = {
    val loadTs = lit(s"$now 00:00:00").cast("timestamp_ntz")
    all(spark, now).map { case (n, df) => n -> graft.cdc.CdcApplier.snapshot(df, loadTs) }
  }

  /** Validate the CHECK constraints of the source DDL
    * (sql/0.init_healthcare.sql:66,77,79,99) — returns violation counts.
    */
  def checkViolations(appts: DataFrame, visits: DataFrame): Long = {
    val badStatus = appts.filter(!col("status").isin(HealthcareSchema.AppointmentStatuses: _*)).count()
    val badType = appts.filter(!col("appointment_type").isin(HealthcareSchema.AppointmentTypes: _*)).count()
    val badCharge = visits.filter(col("total_charge") < 0).count()
    badStatus + badType + badCharge
  }
}
