package graft.pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object PlanDumpX {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val state0 = docs.select(col("doc_id").cast("string").as("word"), lit(1L).as("freq"),
        graft.functions.TextFunctions.tokens(col("text")).as("syms"))
      .filter(size(col("syms")) >= 2 && forall(col("syms"), t => t.rlike("^[a-z]+$")))
    // warm up session
    state0.count()
    val st = timed("checkpoint state0")(state0.localCheckpoint())
    val pos = st.filter(size(col("syms")) >= 2)
      .select(col("word"), col("freq"), explode(expr(
        "transform(sequence(1, size(syms)-1), i -> struct(i AS p, element_at(syms, i) AS l, element_at(syms, i+1) AS r))")).as("x"))
      .select(col("word"), col("freq"), col("x.p").as("p"), col("x.l").as("l"), col("x.r").as("r"))
    val neq = pos.filter(col("l") =!= col("r")).groupBy("l","r").agg(sum("freq").as("cnt")).withColumn("n_merges", col("cnt"))
    val eq = pos.filter(col("l") === col("r"))
      .withColumn("grp", col("p") - row_number().over(Window.partitionBy("word","l").orderBy("p")))
      .groupBy("word","freq","l","grp").agg(count(lit(1)).as("c"))
      .groupBy("l").agg(sum(expr("freq * c")).as("cnt"), sum(expr("freq * ((c+1) DIV 2)")).as("n_merges"))
      .select(col("l"), col("l").as("r"), col("cnt"), col("n_merges"))
    val stats = neq.unionByName(eq)
    timed("pairStats rank+collect")(stats.orderBy(col("cnt").desc, col("l"), col("r")).limit(512).collect())
    timed("pairStats again")(stats.orderBy(col("cnt").desc, col("l"), col("r")).limit(512).collect())
    timed("totals")(st.select(explode(col("syms")).as("s"), col("freq")).agg(sum("freq"), countDistinct("s")).collect())
    val pairs = Seq(("data","join"),("hash","scan"),("row","batch"),("filter","column"))
    val applied = st.select(col("word"), col("freq"),
      BpeQueries.applyBatchExpr(pairs, " ").as("syms"))
    timed("apply+checkpoint")(applied.localCheckpoint())
    val applied2 = st.select(col("word"), col("freq"),
      BpeQueries.applyBatchExpr(Seq(("small","merge"),("order","line")), " ").as("syms"))
    timed("apply+checkpoint 2 (new expr)")(applied2.localCheckpoint())
    timed("apply+checkpoint 3 (same expr)")(st.select(col("word"), col("freq"),
      BpeQueries.applyBatchExpr(pairs, " ").as("syms")).localCheckpoint())
    spark.stop()
  }
}
