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

  test("convergence-driven face: same bits as the fixed face, monotone deltas, terminates") {
    val d = sf()
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(3))).toMap

    // tol = 0 never triggers early → exactly maxIterations rounds, and the
    // result must be BIT-identical to the unrolled fixed face: convergence
    // changes when you stop, never what you compute
    val (r3, rounds3, d3) = GraphQueries.pagerankConverged(spark, d,
      tolScaled = 0L, maxIterations = 3)
    assert(rounds3 == 3)
    assert(asMap(r3) == asMap(GraphQueries.pagerank(spark, d, iterations = 3)))

    // a loose tolerance terminates BEFORE the cap with delta ≤ tol, and the
    // rounds it ran still agree with the fixed face at that count. Decay
    // rate: the dominant residual is the damping-scaled oscillating
    // component of this near-bipartite graph, ~0.85^k of the hub ranks
    // (~Scale/n_suppliers), so tol = Scale/1000 lands around round 30.
    val tol = Scale / 1000 // 0.1% of total mass per node
    val (rC, roundsC, dC) = GraphQueries.pagerankConverged(spark, d,
      tolScaled = tol, maxIterations = 60)
    assert(roundsC < 60, s"did not converge in 60 rounds (last delta $dC)")
    assert(dC <= tol, s"terminated with delta $dC above tol $tol")
    assert(asMap(rC) == asMap(GraphQueries.pagerank(spark, d, iterations = roundsC)))
    // deltas shrink: the fixed-point iteration is a contraction (damping
    // 0.85), so one more round past convergence must not blow back up
    assert(dC <= d3 || roundsC <= 3)
  }
}
