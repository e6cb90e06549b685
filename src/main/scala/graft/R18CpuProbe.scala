package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 root-cause probe for the fan-out CPU anomaly (r17 rejection #4, r18
  * verdict item 5): the SAME allocation-heavy map work (tokenize → shingle
  * array → explode over the documents corpus, the shinglePostings body) run
  * at fan-out widths 1/2/4/8/16/32, measuring per width
  *   - wall seconds,
  *   - process-CPU seconds (what the bench's CPU-mover gate adjudicates),
  *   - JVM GC collection time (GarbageCollectorMXBean deltas),
  * so "fanned-out aggregates burn 5-7x CPU" can be decomposed into
  * (a) GC/allocator work that scales with concurrency and (b) per-task
  * compute inflation (memory-bandwidth contention shows up here: a stalled
  * cycle is still a busy cycle to the OS scheduler).
  *
  * Writes bench/r18_cpu_probe.json. Pure measurement tooling — never on a
  * query path.
  */
object R18CpuProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val docs = graft.analytics.Tables.documents(spark, sfDir)
    def body(width: Int) = {
      val base = if (width <= 1) docs else docs.repartition(width)
      base.select(col("doc_id"),
        explode(TextFunctions.wordShingles(TextFunctions.tokens(col("text")))).as("sh"))
    }
    // warm up JIT/codegen on the exact shapes once
    body(1).count(); body(8).count()
    val reps = 3
    val rows = Seq(1, 2, 4, 8, 16, 32).map { w =>
      val runs = (1 to reps).map { _ =>
        System.gc()
        val gc0 = gcMillis(); val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
        body(w).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9,
          (osBean.getProcessCpuTime - c0) / 1e9,
          (gcMillis() - gc0) / 1e3)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val r = (w, med(runs.map(_._1)), med(runs.map(_._2)), med(runs.map(_._3)))
      println(f"[cpuprobe] width=${r._1}%2d wall=${r._2}%6.3f cpu=${r._3}%7.3f gc=${r._4}%6.3f")
      r
    }
    val json = rows.map { case (w, wall, cpu, gc) =>
      f"""{"width":$w,"wall":$wall%.3f,"cpu":$cpu%.3f,"gc":$gc%.3f}"""
    }.mkString("""{"probe":"shingle_fanout_cpu","sf":"""" + sfDir +
      """","reps":3,"rows":[""", ",", "]}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench/r18_cpu_probe.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
