package graft.pipeline

import graft.analytics.Tables
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 optimization-round diagnostic: split q_bpe_train_deep's per-pass
  * wall into its two jobs — (a) selection (pairStats → top-512 + totals
  * collect) and (b) batch application + eager checkpoint — on the
  * registered face's own corpus, so the optimization targets the measured
  * component instead of a guess. Writes bench/r17_bpe_opt_probe.json.
  */
object R17BpeOptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BPE_OPT_PASSES", "18").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    var state = BpeQueries.deepPhraseState(Tables.documents(spark, sfDir))
      .select(col("word"), col("freq"), col("syms")).stableCheckpoint()
    val selSecs = Seq.newBuilder[Double]
    val appSecs = Seq.newBuilder[Double]
    for (_ <- 0 until passes) {
      val (selRes, sSec) = t(BpeQueries.probeSelect(state, 32, 512))
      selSecs += sSec
      val (next, aSec) = t(state.select(col("word"), col("freq"),
        BpeQueries.applyBatchExpr(selRes.map(x => (x._1, x._2)), " ").as("syms"))
        .stableCheckpoint())
      appSecs += aSec
      state = next
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val sel = selSecs.result(); val app = appSecs.result()
    val json = s"""{"metric":"r17_bpe_opt_probe","sf":"$sfDir","passes":$passes,""" +
      s""""sel_total":${f"${sel.sum}%.2f"},"app_total":${f"${app.sum}%.2f"},""" +
      s""""sel":${fmt(sel)},"app":${fmt(app)}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench/r17_bpe_opt_probe.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
