package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B micro-benchmark for single plan stages — exists because
  * whole-suite timings on a shared box drift 1.3–1.6× between runs, which
  * swamps any per-stage effect; alternating the two formulations inside ONE
  * JVM run cancels the ambient drift out of the comparison.
  *
  * Subjects (SPARK_GRAFT_MICRO=name), over
  * `SPARK_GRAFT_MICRO_DIR/embeddings.parquet`:
  *  - `banding`: the RP-LSH banding map stage — native
  *    [[org.apache.spark.sql.graft.RpBandKeys]] (one constant-size codegen
  *    loop) vs the composed bands×bits FloatVectorDot formulation it
  *    replaced (which trips janino's 64 KB method limit at adaptive-banding
  *    plane counts and silently falls back to interpreted execution).
  * Prints one JSON line with per-rep seconds for both sides.
  */
object MicroBench {

  private def composedBandKeys(v: Column, bands: Int, bits: Int): Column = {
    import org.apache.spark.sql.graft.VectorExpressions.{fastDot, litFloatArray}
    array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        (0 until bits).map { j =>
          val proj = fastDot(v, litFloatArray(
            pipeline.SimilarityQueries.hyperplanesForTest(b * bits + j)))
          when(proj > 0, lit(1 << j)).otherwise(lit(0)): Column
        }.reduce(_ bitwiseOR _).as("band_key"))
    }: _*)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_MICRO_DIR", "target/scale_probe_x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MICRO_REPS", "4").toInt
    val bands = sys.env.getOrElse("SPARK_GRAFT_MICRO_BANDS", "30").toInt
    val bits = sys.env.getOrElse("SPARK_GRAFT_MICRO_BITS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Long): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // subject `shingle`: the shingle-derivation projection shape — a ONE-step
    // projection whose transform lambda references the tokenizer EXPRESSION
    // (re-evaluating the regex split per array element — the O(tokens²)
    // hazard repetitionUnits' comment documents) vs a TWO-step projection
    // where the lambda references a materialized `toks` attribute
    // (CollapseProject keeps the boundary because `toks` is referenced more
    // than once and is non-cheap).
    if (sys.env.getOrElse("SPARK_GRAFT_MICRO", "banding") == "shingle") {
      import graft.functions.TextFunctions
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // warm IO
      def oneStep: DataFrame = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("source"), explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col("text")))).as("tok"))
        .groupBy("source").count()
      def twoStep: DataFrame = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("source"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("source"), explode(TextFunctions.wordShingles(col("toks"))).as("tok"))
        .groupBy("source").count()
      def checksumS(df: DataFrame): (Long, Long) = {
        // bit_xor: order-independent and overflow-free (a SUM of 64-bit
        // hashes trips ANSI overflow)
        val r = df.agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(source, count))"), lit(0L)).as("h")).head()
        (r.getLong(0), r.getLong(1))
      }
      require(checksumS(oneStep) == checksumS(twoStep),
        "the two projection shapes must produce identical shingle counts")
      val runs = (1 to reps).map(_ => (time(oneStep.count()), time(twoStep.count())))
      def fmtS(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      println(s"""{"metric":"micro_shingle","reps":$reps,""" +
        s""""one_step":[${runs.map(r => fmtS(r._1)).mkString(",")}],""" +
        s""""two_step":[${runs.map(r => fmtS(r._2)).mkString(",")}]}""")
      spark.stop()
      return
    }

    // subject `hll_parts`: which of q_distinct_hll's two corpus passes is
    // bimodal (reps flip 18 ↔ 290 process-CPU-s on the same plan) —
    // register build vs the cube-countDistinct exact face, interleaved.
    if (sys.env.getOrElse("SPARK_GRAFT_MICRO", "banding") == "hll_parts") {
      import graft.functions.TextFunctions
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      def raw: DataFrame = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("source"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("source"), explode(TextFunctions.wordShingles(col("toks"))).as("tok"))
      def regs(): Long = pipeline.CorpusStatsQueries.hllRegistersForTest(raw).count()
      def exact(): Long = raw.cube(col("source"))
        .agg(countDistinct("tok").as("n_exact")).count()
      val runs = (1 to reps).map(_ => (time(regs()), time(exact())))
      def fmtS(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      println(s"""{"metric":"micro_hll_parts","reps":$reps,""" +
        s""""registers":[${runs.map(r => fmtS(r._1)).mkString(",")}],""" +
        s""""exact_cube":[${runs.map(r => fmtS(r._2)).mkString(",")}]}""")
      spark.stop()
      return
    }

    // subject `md5chain`: the sketch register derivation — old
    // md5→hex→substr→conv chain vs native Md5Hi64+Rho32 — interleaved,
    // under BOTH execution modes: normal whole-stage codegen AND forced
    // interpreted expression evaluation (wholeStage off +
    // codegen.factoryMode=NO_CODEGEN — the state the codegen-cache-thrash
    // pathology degrades hot queries into). The native expression's claim
    // is precisely that its worst case is bounded REGARDLESS of mode; this
    // prints the measured wall + process-CPU for all four cells.
    if (sys.env.getOrElse("SPARK_GRAFT_MICRO", "banding") == "md5chain") {
      import graft.functions.TextFunctions
      val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      def timedCpu(body: => Long): (Double, Double) = {
        spark.catalog.clearCache(); System.gc()
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        body
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      // one materialized distinct-shingle frame — both sides hash the SAME
      // rows, so only the derivation differs
      val tok = docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("source"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("source"), explode(TextFunctions.wordShingles(col("toks"))).as("tok"))
        .distinct().localCheckpoint()
      def hexRegs: DataFrame = tok
        .select(col("source"), expr("md5(CAST(concat('hll:', tok) AS BINARY))").as("hx"))
        .select(col("source"),
          expr("CAST(conv(substr(hx, 1, 2), 16, 10) AS BIGINT)").as("bucket"),
          expr("CAST(conv(substr(hx, 3, 8), 16, 10) AS BIGINT)").as("hv"))
        .groupBy("source", "bucket")
        .agg(max(expr("IF(hv = 0, 33, 33 - length(bin(hv)))")).as("m"))
      def nativeRegs: DataFrame = pipeline.CorpusStatsQueries.hllRegistersForTest(tok)
      def sig(df: DataFrame) = df
        .agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(source, bucket, m))"), lit(0L)))
        .head().toString
      require(sig(hexRegs) == sig(nativeRegs),
        "hex chain and native derivation must build identical registers")
      val cells = for (mode <- Seq("codegen", "interpreted")) yield {
        if (mode == "interpreted") {
          spark.conf.set("spark.sql.codegen.wholeStage", "false")
          spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        } else {
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
        hexRegs.count(); nativeRegs.count() // warm this mode's plans
        val runs = (1 to reps).map(_ => (timedCpu(nativeRegs.count()), timedCpu(hexRegs.count())))
        (mode, runs)
      }
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      def fmtS(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      val cellJson = cells.map { case (mode, runs) =>
        s""""$mode":{"native_wall":[${runs.map(r => fmtS(r._1._1)).mkString(",")}],""" +
          s""""native_cpu":[${runs.map(r => fmtS(r._1._2)).mkString(",")}],""" +
          s""""hex_wall":[${runs.map(r => fmtS(r._2._1)).mkString(",")}],""" +
          s""""hex_cpu":[${runs.map(r => fmtS(r._2._2)).mkString(",")}]}"""
      }.mkString(",")
      println(s"""{"metric":"micro_md5chain","reps":$reps,$cellJson}""")
      spark.stop()
      return
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count() // warm IO
    // identical downstream shape (groupBy over band columns) so only the
    // banding expression differs between the two sides
    def nativeBuckets: DataFrame = e.select(col("vec_id"),
        posexplode(pipeline.SimilarityQueries.rpBandKeys(
          col("embedding"), bands = bands, rowsPerBand = bits))
          .as(Seq("band_id", "band_key")))
      .groupBy("band_id", "band_key").count()
    def composedBuckets: DataFrame = e.select(col("vec_id"),
        explode(composedBandKeys(col("embedding"), bands, bits)).as("b"))
      .select(col("vec_id"), col("b.band_id"), col("b.band_key"))
      .groupBy("band_id", "band_key").count()
    def native(): Long = nativeBuckets.count()
    def composed(): Long = composedBuckets.count()

    // Equivalence guard: order-independent CONTENT checksum over every
    // (band_id, band_key, count) bucket — not just the bucket count, which
    // two divergent band-key implementations could tie on. Doubles as JIT
    // warmup for both plan shapes.
    def checksum(buckets: DataFrame): (Long, Long) = {
      val r = buckets.agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("band_id"), col("band_key"), col("count"))), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    require(checksum(nativeBuckets) == checksum(composedBuckets),
      "the two formulations must produce identical (band_id, band_key, count) buckets")
    val runs = (1 to reps).map(_ => (time(native()), time(composed())))
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"metric":"micro_banding","bands":$bands,"bits":$bits,"reps":$reps,""" +
      s""""native":[${runs.map(r => fmt(r._1)).mkString(",")}],""" +
      s""""composed":[${runs.map(r => fmt(r._2)).mkString(",")}]}""")
    spark.stop()
  }
}
