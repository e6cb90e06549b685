package graft

import org.apache.spark.sql.SparkSession

/** r18 probe for the sub-second tail's per-query fixed floor (~0.25 s x 192
  * queries ≈ 49 s of the suite; r17 verdict item 3): for a sample of tail
  * queries, decompose one bench rep into
  *   - build seconds (the registry fn: parquet schema/file-index reads,
  *     any construction-time jobs),
  *   - execute seconds (the count() action itself),
  * and count the Spark jobs/stages/tasks the rep submits (listener), so
  * "where does the floor live" has numbers: driver planning vs job count vs
  * task scheduling.
  *
  * Writes bench/r18_tail_probe.json. Measurement tooling only.
  */
object R18TailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq(
        // representative tail: relational, cdc, hc_, sm_, stream, text
        "q_global_kpi", "q_proj_filter", "q_join_2way", "q_topk_customers",
        "q_cdc_latest_per_key", "q_cdc_scd2", "q_window_funcs",
        "q_grouping_sets", "q_text_stats", "q_token_bpe",
        "hc_daily_revenue", "hc_status_distribution", "hc_executive_summary",
        "sm_total_appointments", "sm_revenue_by_doctor",
        "q_stream_tumbling", "q_stream_dedup", "q_sample_weighted",
        "q_dedup_exact", "q_sessionize")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.analytics.HealthcareData.ensure(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def sync(): Unit = {
      // listenerBus is private[spark]; a short sleep drains the async bus
      // well enough for a coarse job/stage/task census
      Thread.sleep(300)
    }
    val out = new StringBuilder
    out.append("""{"probe":"tail_floor","rows":[""")
    var first = true
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm rep (JIT, codegen cache) — mirrors the bench's median-of-3
      fn(spark, sfDir).count()
      sync()
      spark.catalog.clearCache(); System.gc()
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      sync()
      val row = f"""{"q":"$n","build":${(t1 - t0) / 1e9}%.4f,"exec":${(t2 - t1) / 1e9}%.4f,"jobs":$jobs,"stages":$stages,"tasks":$tasks}"""
      println(s"[tailprobe] $row")
      if (!first) out.append(",")
      out.append(row); first = false
    }
    out.append("]}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench/r18_tail_probe.json"),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
