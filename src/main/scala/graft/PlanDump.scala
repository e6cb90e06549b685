package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q_hybrid_rrf_batch")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("MATCHES:")
    "hashpartitioning\\(doc_id#\\d+L?, term#\\d+[^)]*, \\d+\\)[^\n]*".r.findAllIn(p).foreach(m => println("  " + m.take(120)))
    spark.stop()
  }
}
