package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage forensics for the PPJoin prefix-filter face
  * (`DedupQueries.nearDupPairsPrefix`), which the ×20 family probe measured
  * at ratio 30.6× for 20× data (`bench/scale_probe_families_x20.json`) while
  * the plain inverted-index face rode 4.9×. Times and counts each stage of
  * the prefix pipeline on the base and replicated corpora so the
  * super-linear stage is identified by measurement, CcForensic-style,
  * instead of plan-reading guesses.
  */
object PrefixForensic {
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

    val minJ = 0.8
    def stages(d: String): Seq[(String, () => DataFrame)] = {
      val docs = analytics.Tables.documents(spark, d)
      val sh = pipeline.DedupQueries.shinglePostings(docs)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val ranked = sh.join(dfreq, "sh")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "sh")))
        .join(sizes, "doc_id")
      val prefix = ranked
        .filter(col("rk") <= col("n") - ceil(lit(minJ) * col("n")) + 1)
        .filter(col("df") > 1)
        .select("doc_id", "sh", "n")
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")) >= lit(minJ) * greatest(col("a.n"), col("b.n")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
      val candD = cand.distinct()
      val inter = candD
        .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(count(lit(1)).as("n_inter"))
      Seq(
        "postings" -> (() => sh),
        "prefix" -> (() => prefix),
        "cand_raw" -> (() => cand),
        "cand_distinct" -> (() => candD),
        "verify" -> (() => inter))
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    Seq("x1" -> src, s"x$repl" -> dir).foreach { case (tag, d) =>
      stages(d).foreach { case (name, f) =>
        f().count() // warm (codegen compile)
        val (s, n) = time(f().count())
        println(f"[prefix-forensic] $tag $name%-14s ${s}%8.2f s  $n%,12d rows")
      }
    }
    spark.stop()
  }
}
