package graft

import org.apache.spark.sql.SparkSession

/** Minimal reproduction harness for the ×20 dedup_prefix anomaly: runs the
  * REGISTERED q_dedup_prefix_filter on the replicated corpus exactly the way
  * FamilyScaleProbe does (clearCache + GC before each rep, warm rep on the
  * BASE corpus only), then twice more, printing each rep — separates
  * "first-execution-at-×20 one-off" from "steady-state plan cost".
  */
object PrefixRepro {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICAS", "20")
    val dir = new java.io.File(s"target/scale_probe_x$repl").getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qname = sys.env.getOrElse("SPARK_GRAFT_REPRO_QUERY", "q_dedup_prefix_filter")
    val q = SparkEntry.queries(qname)
    def rep(tag: String, d: String): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = q(spark, d).count()
      println(f"[prefix-repro] $tag ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n%,d rows")
    }
    q(spark, src).count() // warm on base, as the probe does
    rep("x1 ", src)
    rep(s"x$repl rep1", dir)
    rep(s"x$repl rep2", dir)
    rep(s"x$repl rep3", dir)
    spark.stop()
  }
}
