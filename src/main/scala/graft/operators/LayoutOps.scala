package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout operators — the destination-side answer to the
  * source's B-tree indexes (SURVEY §4: "partition destination tables by
  * date where queries filter on it; rely on parquet min/max + predicate
  * pushdown").
  *
  * At 100 TB the layout IS the index: hive-style date partitions give
  * partition pruning (entire directories skipped at planning time), and
  * sorting within files gives tight parquet min/max ranges so row groups
  * are skipped at scan time.
  */
object LayoutOps {

  /** Write a table partitioned by a derived date column. Queries filtering
    * on `dateCol` then read only matching partitions — LayoutSpec asserts
    * the pruning happens (PartitionFilters in the scan).
    *
    * Repartitioning on (p_date, salt) spreads each date over
    * `filesPerDate` tasks, so every partition directory gets that many
    * files and no single task funnels a whole (possibly skewed) date.
    * The salt is derived from ROW CONTENT (hash of `saltCols`, default all
    * columns), never from spark_partition_id/monotonically_increasing_id:
    * a content hash recomputes identically on stage retry, so a
    * shuffle-fetch failure can't reassign rows across reducers and
    * duplicate/drop output (the SPARK-23207 round-robin-repartition
    * hazard). Caveat of content salting: EXACT duplicate rows collapse to
    * one salt — if the table is duplicate-heavy (pre-dedup corpora), pass
    * a unique id column in `saltCols` to keep the spread.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String, path: String,
      filesPerDate: Int = 1, saltCols: Seq[String] = Nil): Unit = {
    val dated = df.withColumn("p_date", col(tsCol).cast("date"))
    val saltInput = if (saltCols.nonEmpty) saltCols else dated.columns.toSeq
    val distributed =
      if (filesPerDate <= 1)
        dated.repartition(col("p_date"))
      else
        dated
          .withColumn("_salt", pmod(xxhash64(saltInput.map(col): _*), lit(filesPerDate)))
          .repartition(col("p_date"), col("_salt"))
          .drop("_salt")
    distributed
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date")
      .parquet(path)
  }

  /** Sort within partitions on the given columns before writing, so parquet
    * row-group min/max statistics become selective for range predicates.
    */
  def writeSortedWithinPartitions(df: DataFrame, sortCols: Seq[String], path: String,
      numFiles: Int = 4): Unit =
    df.repartition(numFiles)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** Rough file-count sizing for a target output size: ceil(bytes/target).
    * Uses the optimizer's size estimate — the same statistic AQE plans with.
    */
  def targetFileCount(df: DataFrame, targetBytesPerFile: Long): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    math.max(1, (bytes / BigInt(targetBytesPerFile)).toInt +
      (if (bytes % BigInt(targetBytesPerFile) > 0) 1 else 0))
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
