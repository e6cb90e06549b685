package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the integer-exact PageRank that the DuckDB oracle cannot
  * see: rank-mass conservation (the fixed-point arithmetic loses < 1 unit
  * per integral division and nothing else) and partitioning independence
  * (integer arithmetic + commutative-exact aggregates ⇒ the same bits
  * under any shuffle layout — the property that makes the ranking safe to
  * run on 1000 executors).
  */
class GraphQueriesSpec extends SparkSpec {

  private val Scale = 1000000000000L

  test("rank mass is conserved up to bounded integral-division floor loss") {
    val d = sf()
    val ranks = GraphQueries.pagerank(spark, d, iterations = 3)
    val total = ranks.agg(sum("rank_scaled")).head.getLong(0)
    assert(total <= Scale, s"rank mass $total exceeds the injected $Scale")

    val pair = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
    val e = 2L * pair.count() // symmetrized edge count
    val n = pair.select(col("o_custkey")).distinct().count() +
      pair.select(col("l_suppkey")).distinct().count()
    // losses: init SCALE DIV N (< N), per round: one DIV per edge
    // (contribution), one DIV 100 per node (damping), plus the base term's
    // one-off DIV (< N, already inside `base` for every round)
    val bound = n + 3 * (e + 2 * n)
    assert(total >= Scale - bound,
      s"rank mass $total lost more than the floor bound $bound from $Scale")
  }

  test("ranking is bit-identical under a different shuffle partitioning") {
    val d = sf()
    def run() = GraphQueries.pagerank(spark, d, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val base = run()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = run()
      assert(alt == base, "ranks changed with shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
