package graft.pipeline

import graft.SparkSpec
import graft.analytics.Tables
import org.apache.spark.sql.functions._

/** The leakage-free split's structural guarantees (q_split_leakfree): the
  * oracle gate proves the per-(split, lang) rollup; this spec proves the
  * PAIR-level invariant the rollup cannot see, plus determinism and
  * rough proportions.
  */
class SplitSpec extends SparkSpec {

  private lazy val assign = CorpusPipeline.splitLeakfree(Tables.documents(spark, sf()))

  test("no qualifying near-dup pair straddles splits") {
    val docs = Tables.documents(spark, sf())
    val byId = assign.select(col("doc_id"), col("split"))
    // the SAME pair definition the split clusters on
    val eligibleIds = assign.select("doc_id")
    val pairs = DedupQueries.nearDupPairs(
      docs.join(eligibleIds, "doc_id").select("doc_id", "text"), 0.8)
    val straddling = pairs
      .join(byId.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "split_a"), "doc_a")
      .join(byId.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle splits")
    assert(pairs.count() > 0, "gate corpus must actually have near-dup pairs for this to bite")
  }

  test("every doc lands in exactly one split; cluster members share it") {
    val n = assign.count()
    assert(assign.select("doc_id").distinct().count() == n)
    val mixedClusters = assign.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(mixedClusters == 0, s"$mixedClusters clusters span more than one split")
  }

  test("proportions are hash-driven ~80/10/10 and deterministic") {
    val frac = assign.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9, frac.toString)
    assert(frac.getOrElse("val", 0L) > 0 && frac.getOrElse("test", 0L) > 0, frac.toString)
    val again = CorpusPipeline.splitLeakfree(Tables.documents(spark, sf()))
      .collect().map(_.toString).sorted.toSeq
    assert(again == assign.collect().map(_.toString).sorted.toSeq)
  }
}
