package graft

/** Every registered query must at least ANALYZE against the current
  * testdata. Round-9 lesson: the driver regenerated `events.parquet` with a
  * new timestamp encoding and six queries started throwing at analysis time
  * — they silently vanished from the correctness artifact while everything
  * else stayed green. This spec makes a not-even-plannable query a red
  * local test at commit time: `queryExecution.analyzed` forces resolution
  * and type-checking (where Spark 4's NTZ→numeric cast ban fires) without
  * executing the plan, so the whole registry probes in seconds.
  *
  * Queries whose builders do eager fixture setup still only pay that setup,
  * never a full execution.
  */
class QueryAnalyzesSpec extends SparkSpec {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyzes: $name") {
      val analyzed = fn(spark, sf()).queryExecution.analyzed
      assert(analyzed != null)
    }
  }

  test("registry and oracle map are consistent") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql names unregistered queries: $orphans")
  }
}
