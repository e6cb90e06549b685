package graft.plans

import graft.SparkSpec
import graft.analytics.Tables
import org.apache.spark.sql.functions._

/** Behavioral gate for the r12-advice registry fix: two rollups with
  * DIFFERENT grouping shapes over the SAME base table must coexist — the
  * old basePathSuffix-only key let the second registration silently evict
  * the first, and its rewrite stopped firing.
  */
class RollupRegistrySpec extends SparkSpec {

  private def userQueryA = Tables.orders(spark, sf())
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n_coexist_a"))
  private def userQueryB = Tables.orders(spark, sf())
    .groupBy(col("o_orderstatus"))
    .agg(count(lit(1)).as("n_coexist_b"))

  test("two rollup shapes over one base coexist; both rewrites fire") {
    // expected results BEFORE any registration (nothing matches these
    // alias names yet, so these run against the base)
    val expA = userQueryA.collect().map(_.toSeq).toSet
    val expB = userQueryB.collect().map(_.toSeq).toSet

    RollupRewrite.materializeAndRegister(spark, userQueryA,
      s"${sf()}/orders.parquet", "target/rollup_store/test_coexist_a")
    RollupRewrite.materializeAndRegister(spark, userQueryB,
      s"${sf()}/orders.parquet", "target/rollup_store/test_coexist_b")

    val planA = userQueryA.queryExecution.executedPlan.toString
    val planB = userQueryB.queryExecution.executedPlan.toString
    // the FIRST registration must still fire after the second one landed
    assert(planA.contains("test_coexist_a") && !planA.contains("orders.parquet"),
      planA.take(2000))
    assert(planB.contains("test_coexist_b") && !planB.contains("orders.parquet"),
      planB.take(2000))
    // and both serve result-identical rows
    assert(userQueryA.collect().map(_.toSeq).toSet == expA)
    assert(userQueryB.collect().map(_.toSeq).toSet == expB)
  }
}
