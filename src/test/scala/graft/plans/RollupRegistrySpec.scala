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

  test("re-materializing a rollupPath with a different canonical evicts the stale spec") {
    val path = "target/rollup_store/test_stale_path"
    // defs, not vals: queryExecution is lazily CACHED per DataFrame, so a
    // val built before registration would keep its unrewritten plan
    def shape1 = Tables.orders(spark, sf())
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_stale"))
    // a DIFFERENT query shape whose output alias coincides — the dangerous
    // case: the stale spec's byName remap would succeed and silently serve
    // shape 2's data to a shape-1 query
    def shape2 = Tables.orders(spark, sf())
      .groupBy(col("o_orderstatus").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_stale"))
    val exp1 = shape1.collect().map(_.toSeq).toSet

    RollupRewrite.materializeAndRegister(spark, shape1,
      s"${sf()}/orders.parquet", path)
    assert(shape1.queryExecution.executedPlan.toString.contains("test_stale_path"))

    // overwrite the SAME path with shape 2's rollup
    RollupRewrite.materializeAndRegister(spark, shape2,
      s"${sf()}/orders.parquet", path)
    // shape 1's spec must be GONE: its query falls back to the base and
    // stays correct (before the eviction fix it read shape 2's parquet)
    val plan1 = shape1.queryExecution.executedPlan.toString
    assert(plan1.contains("orders.parquet"), plan1.take(2000))
    assert(shape1.collect().map(_.toSeq).toSet == exp1)
  }
}
