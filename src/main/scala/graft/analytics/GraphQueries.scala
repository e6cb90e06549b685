package graft.analytics

import graft.QueryDef
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relationship graphs derived from the relational
  * tables — the iterative-dataflow shape class (fixed-point computations
  * whose each round is a join + aggregate over an edge list).
  *
  * Reference behavior: the CDC-replicated warehouse exposes the
  * customer/supplier purchase network implicitly (orders ⋈ lineitem);
  * ranking its influential nodes is the canonical downstream graph
  * workload (PageRank, Brin & Page 1998). Re-expressed integer-exact so
  * the per-iteration state hash-gates cross-engine: ranks live in a
  * ×10¹²-scaled BIGINT fixed-point domain, every division is integral
  * (`DIV`), and ties in the final ranking break by node id — no float
  * accumulates anywhere, so summation order (and therefore partitioning
  * and parallelism) cannot change a single output bit.
  *
  * Scale design (the 100 TB story):
  *  - the edge list is built once by a keyed aggregate (map-side combined)
  *    and is the ONLY large dataset; each PageRank round is one shuffle
  *    keyed by `src` (contribution join) plus one keyed by `dst`
  *    (partial-aggregating sum) — the classic Pregel round expressed as
  *    Catalyst joins, so AQE/skew handling apply per round.
  *  - the REGISTERED face fixes the iteration count (3) so the plan is a
  *    finite, oracle-gateable DAG; the production fixed-point loop is
  *    [[pagerankConverged]] — per-round checkpointed ranks and a 1-row
  *    max-delta termination aggregate, proven bit-equal to the fixed face
  *    at every round count by GraphQueriesSpec.
  *  - rank mass is conserved up to integral-division floor loss (each DIV
  *    drops < 1 unit per edge/node per round — bounded, asserted by
  *    GraphQueriesSpec), so no renormalization pass is needed.
  *  - the graph is SYMMETRIZED (customer→supplier and supplier→customer
  *    edges), which both matches the undirected influence semantics of a
  *    purchase network and eliminates dangling-node mass leakage without a
  *    global redistribution term (a directed variant would add the
  *    standard dangling-sum broadcast — one extra 1-row aggregate).
  */
object GraphQueries {

  /** ×10¹² fixed-point scale: big enough that 3 rounds of floor loss over
    * ~10⁵ edges stay ≪ 1% of any reported rank, small enough that
    * rank×weight products stay far inside BIGINT (10¹²·10⁴ ≪ 2⁶³).
    */
  private val Scale = 1000000000000L

  /** Convergence tolerance for the gated fixed-point face: 10⁻⁴ of the
    * total rank mass, absolute, in the ×10¹² fixed-point domain.
    */
  private[analytics] val ConvTol = 100000000L

  /** Round cap — a backstop well above observed convergence (29 at
    * sf0.01, fewer at larger N since per-node deltas shrink with 1/N).
    */
  private[analytics] val ConvCap = 60

  /** Rounds the ConvTol fixed point takes on the sf0.01 gate data —
    * pinned so the DuckDB oracle can unroll exactly that many rounds.
    */
  private[analytics] val ConvRoundsSf001 = 29

  /** DuckDB oracle for k unrolled PageRank rounds — one generator feeds
    * both the fixed-3-round gate and the convergence gate, so the two
    * oracles cannot drift apart. Every CTE is MATERIALIZED: DuckDB inlines
    * plain CTEs per reference, so a 29-round chain would otherwise
    * re-expand the edge aggregate ~30× (and blow the open-file limit
    * re-scanning the parquet each time); materialization changes only the
    * oracle's plan, never its rows.
    */
  private def pagerankSql(k: Int, extraCols: String = ""): String = {
    val rounds = (1 to k).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM((r.rank * e.w) // o.wout) AS BIGINT) AS sc
         |       FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN outw o ON e.src = o.src
         |       GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT r${i - 1}.node, r${i - 1}.base,
         |              CAST(r${i - 1}.base + (85 * COALESCE(c$i.sc, 0)) // 100 AS BIGINT) AS rank
         |       FROM r${i - 1} LEFT JOIN c$i ON r${i - 1}.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pair AS MATERIALIZED (
       |  SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT CAST(c AS BIGINT) * 2 AS src, CAST(s AS BIGINT) * 2 + 1 AS dst, w FROM pair
       |  UNION ALL
       |  SELECT CAST(s AS BIGINT) * 2 + 1, CAST(c AS BIGINT) * 2, w FROM pair),
       |outw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |n AS (SELECT COUNT(*) AS cnt FROM nodes),
       |r0 AS MATERIALIZED (SELECT node,
       |              CAST($Scale // cnt AS BIGINT) AS rank,
       |              CAST(($Scale * 15) // (cnt * 100) AS BIGINT) AS base
       |       FROM nodes CROSS JOIN n),
       |$rounds
       |SELECT node, node % 2 = 0 AS is_customer, node // 2 AS entity_key,
       |       rank AS rank_scaled$extraCols
       |FROM r$k
       |ORDER BY rank_scaled DESC, node
       |LIMIT 20""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- Integer-exact PageRank over the purchase graph, 3 rounds -----
    // Nodes: customers (2·custkey) and suppliers (2·suppkey+1) that appear
    // in at least one order line; edges weighted by lineitem count and
    // symmetrized. r' = (1−d)/N + d·Σ_in (r·w)/W_out with d = 85/100, all
    // in scaled BIGINT arithmetic.
    QueryDef("q_pagerank", pagerankSql(3)) { (s, d) =>
      pagerank(s, d, iterations = 3)
        .orderBy(col("rank_scaled").desc, col("node"))
        .limit(20)
    },

    // ----- convergence-driven PageRank under the driver gate -----
    // The production face ([[pagerankConverged]]) iterates to a fixed
    // point instead of a fixed round count. With tol = 10⁻⁴ of the total
    // mass (ConvTol = 10⁸ in the ×10¹² domain) the sf0.01 gate data
    // terminates after exactly 29 rounds (deterministic: integer-exact
    // arithmetic over a deterministic graph — the pin is part of the
    // gate, like the retention-delete ids). The oracle unrolls those 29
    // rounds through the SAME generated CTE chain the fixed face's
    // 3-round oracle uses, and recomputes the terminal max-delta as
    // max|r29 − r28| — so the gate re-proves, in DuckDB, both the final
    // ranks AND that round 29 is where the loop was entitled to stop.
    QueryDef(
      "q_pagerank_converged",
      pagerankSql(ConvRoundsSf001,
        extraCols = s""",
           |       CAST($ConvRoundsSf001 AS BIGINT) AS rounds,
           |       (SELECT CAST(MAX(ABS(a.rank - b.rank)) AS BIGINT)
           |        FROM r$ConvRoundsSf001 a JOIN r${ConvRoundsSf001 - 1} b ON a.node = b.node) AS max_delta""".stripMargin)) { (s, d) =>
      val (ranks, rounds, delta) = pagerankConverged(s, d, ConvTol, ConvCap)
      ranks.orderBy(col("rank_scaled").desc, col("node")).limit(20)
        .withColumn("rounds", lit(rounds.toLong))
        .withColumn("max_delta", lit(delta))
    },

    // ----- triangle counting on the bounded-degree co-supply graph -----
    // Suppliers are linked by the parts they both supply; each node keeps
    // only its top-5 strongest co-suppliers (shared-part count, ties by
    // neighbor id) before canonicalizing to an undirected edge set, and
    // triangles are enumerated with the standard ordered-edge wedge join
    // (a < b < c, e.g. Suri & Vassilvitskii 2011 §3). The kNN prune is the
    // 100 TB design: absolute co-occurrence thresholds don't transfer
    // across corpus sizes (measured here: mean pair weight 134 at sf0.01
    // vs 17 at sf0.1), but top-k-per-node caps degree ≤ 2k at ANY scale,
    // so the wedge join is ≤ n·(2k)² rows no matter how dense the raw
    // co-occurrence is. The raw pair aggregate itself is the inverted-
    // index shape (per-part supplier lists joined to themselves) and
    // inherits the dedup family's hot-key story: a pathologically popular
    // part would be df-capped/salted exactly like a hot shingle.
    QueryDef(
      "q_graph_triangles",
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        |cow AS (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS w
        |        FROM ps a JOIN ps b ON a.p = b.p AND a.sk <> b.sk GROUP BY 1, 2),
        |knn AS (SELECT u, v FROM (
        |          SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v) AS rk
        |          FROM cow) t
        |        WHERE rk <= 5),
        |e AS (SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM knn),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT u FROM
        |          (SELECT u FROM e UNION ALL SELECT v FROM e) t) x) AS n_nodes,
        |       (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT COUNT(*) FROM tri) AS n_triangles""".stripMargin) { (s, d) =>
      // (r17: eager checkpoints of ps and e were prototyped — the initial
      // plan re-derives both per consumer (24 scans) — and measured
      // NEUTRAL in an identical 3-query harness (4.43 vs 4.61 s): AQE's
      // runtime exchange reuse already collapses the duplicates, so the
      // materialization only re-bought what reuse gave. Left as-is.)
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
      val cow = ps.as("a").join(ps.as("b"),
          col("a.p") === col("b.p") && col("a.sk") =!= col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("w"))
      val knn = cow
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("u")
            .orderBy(col("w").desc, col("v"))))
        .filter(col("rk") <= 5).select("u", "v")
      val e = knn.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v")).distinct()
      val tri = e.as("e1")
        .join(e.as("e2"), col("e2.u") === col("e1.v"))
        .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      val nNodes = e.select(col("u")).unionAll(e.select(col("v"))).distinct()
        .agg(count(lit(1)).as("n_nodes"))
      val nEdges = e.agg(count(lit(1)).as("n_edges"))
      val nTri = tri.agg(count(lit(1)).as("n_triangles"))
      nNodes.crossJoin(nEdges).crossJoin(nTri)
    }
  )

  /** Full rank table (node, is_customer, entity_key, rank_scaled) after
    * `iterations` rounds — the registered face top-20s it; the spec
    * asserts mass conservation and partitioning independence on the whole
    * table.
    */
  def pagerank(s: org.apache.spark.sql.SparkSession, d: String,
      iterations: Int): DataFrame = {
    val pair = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
    // EAGER checkpoint of the per-round probe frame (src, dst, w, wout),
    // PRE-JOINED with the out-weight aggregate and PRE-PARTITIONED on the
    // join key. Three effects, each measured when this replaced the r10
    // shape (checkpoint of the bare edge list, outw/e re-derived per
    // round):
    //  1. the lineitem⋈orders aggregate AND the out-weight groupBy run
    //     exactly once — before, every round's contribution join re-drove
    //     the outw shuffle (ReuseExchange happened to dedupe some but not
    //     all copies under AQE re-planning);
    //  2. the checkpointed LogicalRDD retains HashPartitioning(src), so
    //     each round's e⋈ranks join shuffles ONLY the (small) rank frame —
    //     the edge side, the big one at scale, never moves again;
    //  3. eager (never lazy) for the AQE-race reason in Checkpoints' doc.
    val e = edges(pair).repartition(col("src")).stableCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct()
    // N reaches the per-node expressions via a broadcast 1-row aggregate —
    // never a driver collect (the bounded-crossJoin pattern the GDPR audit
    // uses). This face unrolls WITHOUT per-round checkpoints (the
    // registered query is a finite 3-round DAG, and the spec unrolls ~30
    // rounds for the convergence cross-check), so the round body must
    // reference the evolving rank frame exactly ONCE: logical plans are
    // trees, and a second reference per round doubles the tree per
    // round — 2^k analysis blowup by round 30 (measured: DeduplicateRelations
    // never returns). Hence the constant (node, base) frame is joined
    // separately, and the fused delta-carrying [[step]] is reserved for
    // the converged loop whose rounds are checkpointed leaves.
    val init = initRanks(nodes)
    val nodesBase = init.select("node", "base")
    var ranks = init.select("node", "rank")
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(rank * w) DIV wout").as("c"))
        .groupBy("node").agg(sum("c").as("sc"))
      ranks = nodesBase.join(contrib, Seq("node"), "left").select(
        col("node"),
        (col("base") + expr("(85 * coalesce(sc, 0)) DIV 100")).cast("long").as("rank"))
    }
    ranks.select(
      col("node"),
      (col("node") % 2 === 0).as("is_customer"),
      expr("node DIV 2").as("entity_key"),
      col("rank").as("rank_scaled"))
  }

  /** Convergence-driven PageRank — the production face the fixed-3-round
    * registered query stands in for (the registered face unrolls a finite
    * DAG so it is oracle-gateable; a real deployment iterates to a fixed
    * point). Rounds run until the MAX per-node absolute rank delta (in the
    * same ×10¹² fixed-point domain, so the test is integer-exact) falls to
    * `tolScaled` or below, capped at `maxIterations`. Each round costs the
    * same two keyed shuffles as the fixed face — the termination test is
    * NOT a third: [[step]] carries `|rank − prev rank|` as a column of the
    * round's checkpointed frame, so the max-delta is a cheap scan of
    * blocks the checkpoint just materialized (the r11 shape paid a whole
    * extra node⋈node join per round for the same number). Each round's
    * rank frame is checkpointed through [[graft.operators.Checkpoints]]
    * (local by default, reliable under SPARK_GRAFT_CHECKPOINT_DIR), so
    * lineage stays one round deep at any iteration count. Rounds-run-so-
    * far agree bit-for-bit with the fixed-iteration face (GraphQueriesSpec
    * proves it), so convergence changes WHEN you stop, never WHAT you
    * compute.
    *
    * Returns (final ranks frame, rounds run, final max delta).
    */
  def pagerankConverged(s: org.apache.spark.sql.SparkSession, d: String,
      tolScaled: Long, maxIterations: Int): (DataFrame, Int, Long) = {
    require(tolScaled >= 0 && maxIterations >= 1)
    val pair = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
    val e = edges(pair).repartition(col("src")).stableCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct()
    var ranks = initRanks(nodes).stableCheckpoint()
    var rounds = 0
    var delta = Long.MaxValue
    while (delta > tolScaled && rounds < maxIterations) {
      // r17: the termination max rides an OBSERVED metric on the very
      // frame the round checkpoints — the checkpoint's materialization
      // fills the accumulator, so the delta costs ZERO extra jobs (the r16
      // loop ran a separate 1-row max aggregate per round: 29 extra jobs
      // per rep at the sf0.01 pin). max() is idempotent under task
      // retries, so the observed value equals the aggregate the old job
      // computed; rounds/ranks are bit-identical (GraphQueriesSpec).
      // (r18 re-adjudication of the r17 driver regression reading: idle
      // 5-rep A/B of this observed-metric form vs the r16 separate-max-job
      // shape measured 8.57 vs 8.87 s medians — a wash within noise, so
      // the fewer-jobs form stays; the driver's 7.8 s was ambient.)
      val stepped = step(e, ranks).observe(s"pr_delta_$rounds", max(col("dlt")))
      val next = stepped.stableCheckpoint()
      val m = stepped.queryExecution.observedMetrics(s"pr_delta_$rounds")
      require(!m.isNullAt(0), "PageRank: empty rank frame — no nodes")
      delta = m.getLong(0)
      ranks = next
      rounds += 1
    }
    (ranks.select(
      col("node"),
      (col("node") % 2 === 0).as("is_customer"),
      expr("node DIV 2").as("entity_key"),
      col("rank").as("rank_scaled")), rounds, delta)
  }

  /** Symmetrized weighted edge list PRE-JOINED with its out-weight
    * aggregate: (src, dst, w, wout). Built once per query and checkpointed
    * by the callers — at 100 TB this is the only large frame, and
    * re-deriving the wout groupBy per round (the r11 shape) re-shuffled it
    * every iteration.
    */
  private def edges(pair: DataFrame): DataFrame = {
    val es = pair.select(
        (col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"), col("w"))
      .unionAll(pair.select(
        (col("l_suppkey").cast("long") * 2 + 1).as("src"),
        (col("o_custkey").cast("long") * 2).as("dst"), col("w")))
    es.join(es.groupBy("src").agg(sum("w").as("wout")), "src")
  }

  /** Uniform start state (node, base, rank). `base` — the (1−d)/N
    * teleport term — rides INSIDE the rank frame so each round joins the
    * contribution aggregate once, against a single frame, instead of once
    * against ranks and once against a separate base frame.
    */
  private def initRanks(nodes: DataFrame): DataFrame = {
    val n1 = nodes.agg(count(lit(1)).as("cnt"))
    nodes.crossJoin(broadcast(n1)).select(
      col("node"),
      expr(s"CAST(($Scale * 15) DIV (cnt * 100) AS BIGINT)").as("base"),
      expr(s"CAST($Scale DIV cnt AS BIGINT)").as("rank"))
  }

  /** One PageRank round: r' = base + d·Σ_in (r·w) DIV W_out, d = 85/100,
    * all integral. Returns (node, base, rank, dlt) where `dlt` is the
    * per-node |r' − r| — free to compute here (both values are in hand)
    * and what lets the convergence loop read its termination signal off
    * the frame it checkpoints anyway. Two keyed shuffles: ranks→src for
    * the contribution join (the checkpointed e side is already hash-
    * partitioned on src and never moves), contributions→node for the sum.
    *
    * ONLY for loops that checkpoint each round: this body references
    * `ranks` twice (contribution probe + delta base), which is fine
    * against a LogicalRDD leaf but doubles an unrolled declarative tree
    * per round — see the fixed face's comment.
    */
  private def step(e: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = e
      .join(ranks.select(col("node").as("src"), col("rank")), "src")
      .select(col("dst").as("node"), expr("(rank * w) DIV wout").as("c"))
      .groupBy("node").agg(sum("c").as("sc"))
    val newRank = (col("base") + expr("(85 * coalesce(sc, 0)) DIV 100")).cast("long")
    ranks.join(contrib, Seq("node"), "left").select(
      col("node"), col("base"), newRank.as("rank"),
      abs(newRank - col("rank")).as("dlt"))
  }
}
