package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Forensic rep-runner for the `q_corpus_clean_cc` load tail (round-8 verdict
  * "What's wrong #3": driver rep 3 = 23.86 s at 4× the median under loadavg
  * ~2.5; something in the union-find path suspected of spilling under
  * ambient pressure).
  *
  * Runs `q_corpus_clean` and `q_corpus_clean_cc` alternately for `reps`
  * rounds and prints ONE JSON line per (query, rep) with wall time,
  * process-CPU time, and stage-aggregated task metrics (executor run/GC
  * time, memory/disk spill bytes, shuffle bytes) from a listener — enough
  * to separate "a stage spilled" from "the box was busy" from "driver GC".
  *
  * Usage: runMain graft.CcForensic [reps] (SPARK_GRAFT_SF_DIR selects data).
  */
object CcForensic {
  private class StageMetrics extends SparkListener {
    @volatile var runTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var stages = 0
    def reset(): Unit = synchronized {
      runTimeMs = 0; gcTimeMs = 0; memSpill = 0; diskSpill = 0
      shuffleRead = 0; shuffleWrite = 0; stages = 0
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        runTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
      stages += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new StageMetrics
    spark.sparkContext.addSparkListener(listener)

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def driverGcMs(): Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0)); t
    }
    def loadavg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    val queries = Seq("q_corpus_clean", "q_corpus_clean_cc")
    for (rep <- 1 to reps; name <- queries) {
      listener.reset()
      val cpu0 = osBean.getProcessCpuTime
      val gc0 = driverGcMs()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      Thread.sleep(300) // let stage-completed events drain to the listener
      // locale-invariant decimals (the f interpolator follows the JVM
      // default locale and can emit comma separators → invalid JSON)
      def d(v: Double, s: Int) = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
      println(s"""{"query":"$name","rep":$rep,"rows":$n,"wall_sec":${d(wall, 3)},""" +
        s""""proc_cpu_sec":${d(cpuSec, 3)},"loadavg":${d(loadavg(), 2)},""" +
        f""""driver_gc_ms":${driverGcMs() - gc0},"stages":${listener.stages},""" +
        f""""exec_run_ms":${listener.runTimeMs},"exec_gc_ms":${listener.gcTimeMs},""" +
        f""""mem_spill":${listener.memSpill},"disk_spill":${listener.diskSpill},""" +
        f""""shuffle_read":${listener.shuffleRead},"shuffle_write":${listener.shuffleWrite}}""")
    }
    spark.stop()
  }
}
