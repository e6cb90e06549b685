package graft.model

import org.apache.spark.sql.types._

/** Destination-side schemas for the reference's healthcare CDC pipeline
  * (/root/reference sql/0.init_healthcare.sql:43-103, with the
  * connector-added metadata columns of sql/2.verify_snapshot.sql:43-45 —
  * those are appended by [[graft.cdc.CdcApplier]], not declared here).
  *
  * Type mapping per SURVEY.md §1.4: SERIAL→Long, VARCHAR/TEXT→String,
  * DATE→Date, TIME→String 'HH:mm:ss' (Spark has no TIME type; zero-padded
  * strings compare correctly, which sql/3.live_appointments.sql:186,210,308
  * depends on), TIMESTAMP→TimestampNTZ, DECIMAL(10,2)→Decimal(10,2).
  */
object HealthcareSchema {

  /** 7-state machine (sql/0.init_healthcare.sql:77). */
  val AppointmentStatuses: Seq[String] = Seq(
    "scheduled", "confirmed", "checked_in", "in_progress",
    "completed", "cancelled", "no_show")

  /** (sql/0.init_healthcare.sql:79) */
  val AppointmentTypes: Seq[String] = Seq("routine", "urgent", "follow_up", "annual")

  val patients: StructType = StructType(Seq(
    StructField("patient_id", LongType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("date_of_birth", DateType, nullable = false),
    StructField("phone", StringType),
    StructField("email", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("insurance_provider", StringType),
    StructField("registration_date", TimestampNTZType)))

  val doctors: StructType = StructType(Seq(
    StructField("doctor_id", LongType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("specialization", StringType, nullable = false),
    StructField("department", StringType),
    StructField("phone", StringType),
    StructField("email", StringType),
    StructField("years_of_experience", IntegerType),
    StructField("accepting_new_patients", BooleanType)))

  val appointments: StructType = StructType(Seq(
    StructField("appointment_id", LongType, nullable = false),
    StructField("patient_id", LongType, nullable = false),
    StructField("doctor_id", LongType, nullable = false),
    StructField("appointment_date", DateType, nullable = false),
    StructField("appointment_time", StringType, nullable = false), // TIME as 'HH:mm:ss'
    StructField("status", StringType, nullable = false),
    StructField("reason_for_visit", StringType),
    StructField("appointment_type", StringType),
    StructField("created_at", TimestampNTZType),
    StructField("updated_at", TimestampNTZType)))

  val visits: StructType = StructType(Seq(
    StructField("visit_id", LongType, nullable = false),
    StructField("appointment_id", LongType, nullable = false),
    StructField("patient_id", LongType, nullable = false),
    StructField("doctor_id", LongType, nullable = false),
    StructField("visit_date", DateType, nullable = false),
    StructField("visit_start_time", TimestampNTZType, nullable = false),
    StructField("visit_end_time", TimestampNTZType),
    StructField("diagnosis", StringType),
    StructField("treatment_notes", StringType),
    StructField("follow_up_required", BooleanType),
    StructField("prescription_given", BooleanType),
    StructField("total_charge", DecimalType(10, 2))))

  val all: Map[String, StructType] = Map(
    "patients" -> patients,
    "doctors" -> doctors,
    "appointments" -> appointments,
    "visits" -> visits)

  val keyColumns: Map[String, String] = Map(
    "patients" -> "patient_id",
    "doctors" -> "doctor_id",
    "appointments" -> "appointment_id",
    "visits" -> "visit_id")
}
