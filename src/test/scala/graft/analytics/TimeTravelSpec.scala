package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Journal completeness, proven through time travel: replaying the
  * appointments journal over the snapshot up to the journal's FINAL lsn
  * must reproduce the live (post-demo) table exactly — if any event were
  * missing from the journal, or the latest-wins pick disagreed with the
  * applier's, the two states would diverge. (The registered
  * `hc_time_travel_asof` gates a MID-stream reconstruction against DuckDB;
  * this spec pins the endpoint identity.)
  */
class TimeTravelSpec extends SparkSpec {

  private def asOfState(asOf: Long) = {
    HealthcareData.ensure(spark)
    val root = HealthcareData.Root
    val snap = spark.read.parquet(s"$root/appointments")
    val j = spark.read.parquet(s"$root/store/appointments_journal")
      .filter(col("lsn") <= asOf)
    val w = Window.partitionBy("key").orderBy(col("lsn").desc)
    val win = j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "op", "after")
    val surv = win.filter(col("op") =!= "DELETE")
      .select(col("key").cast("long").as("appointment_id"),
        get_json_object(col("after"), "$.status").as("status"),
        get_json_object(col("after"), "$.appointment_date").cast("date")
          .as("appointment_date"))
    val unt = snap.filter(!col("_snowflake_deleted"))
      .join(win.select(col("key").cast("long").as("appointment_id")),
        Seq("appointment_id"), "left_anti")
      .select(col("appointment_id"), col("status"), col("appointment_date"))
    unt.unionByName(surv)
  }

  test("time travel at the journal's final lsn reproduces the live table") {
    HealthcareData.ensure(spark)
    val maxLsn = spark.read
      .parquet(s"${HealthcareData.Root}/store/appointments_journal")
      .agg(max("lsn")).collect()(0).getLong(0)
    val replayed = asOfState(maxLsn)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString)).toSet
    val live = spark.read.parquet(s"${HealthcareData.Root}/appointments_live")
      .filter(!col("_snowflake_deleted"))
      .select(col("appointment_id"), col("status"), col("appointment_date"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString)).toSet
    assert(replayed == live,
      s"journal replay diverges from live state: only-replay=${replayed -- live}, " +
        s"only-live=${live -- replayed}")
  }

  test("time travel monotonicity: key 174's state advances with the lsn bound") {
    val at8 = asOfState(8).filter(col("appointment_id") === 174).collect()
    val at16 = asOfState(16).filter(col("appointment_id") === 174).collect()
    assert(at8.nonEmpty && at16.nonEmpty)
    // lsn 14 (a later UPDATE of 174) is invisible at asOf=8, visible at 16
    val j = spark.read.parquet(s"${HealthcareData.Root}/store/appointments_journal")
    val s8 = j.filter(col("key") === 174 && col("lsn") <= 8)
      .orderBy(col("lsn").desc).select("after").as[String](spark.implicits.newStringEncoder)
      .first()
    val s16 = j.filter(col("key") === 174 && col("lsn") <= 16)
      .orderBy(col("lsn").desc).select("after").as[String](spark.implicits.newStringEncoder)
      .first()
    assert(get(s8, "status") == at8(0).getString(1))
    assert(get(s16, "status") == at16(0).getString(1))
  }

  private def get(json: String, field: String): String = {
    val m = ("\"" + field + "\":\"([^\"]*)\"").r
    m.findFirstMatchIn(json).map(_.group(1)).orNull
  }
}
