package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.TextFunctions.toksSql
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.functions._

/** First-wins (arrival-order greedy) dedup — the ONLINE semantics every
  * streaming dedup service actually implements: documents arrive in
  * order; a document is KEPT iff no already-KEPT earlier document is a
  * near-dup of it, and only kept documents enter the index. This is the
  * lexicographically-first maximal independent set of the near-dup graph
  * under arrival order — a DIFFERENT answer from the CC survivor policy
  * on chains (a~b, b~c, a≁c: greedy keeps a AND c; CC keeps only a), and
  * the difference is the point: batch CC over-deletes relative to what
  * the online service would have kept.
  *
  * Distributed shape: greedy order looks inherently sequential, but the
  * dependency graph is a DAG by arrival order, so synchronous waves
  * resolve it: wave 0 keeps every vertex with no earlier neighbor; each
  * later wave drops unresolved vertices with a KEPT earlier neighbor and
  * keeps those whose earlier neighbors are ALL dropped. Each wave is two
  * joins + one count aggregate over the (bounded) pair graph — never the
  * corpus — checkpointed per round (the PageRank lineage law); rounds ≤
  * the longest order-ascending dependency chain (≈ dup-cluster diameter).
  * Non-convergence within the bound THROWS rather than emitting a wrong
  * keep set. The oracle replays the same waves as unrolled MATERIALIZED
  * CTEs over the same exact-Jaccard pair graph.
  */
object FirstWinsDedupQueries {

  private val MinJ = 0.8
  private val MaxRounds = 16
  // The oracle MUST unroll as many waves as the Spark side may run: with a
  // shorter unroll, a dependency chain of depth OracleRounds+1..MaxRounds
  // would leave the oracle's final res missing the unresolved vertices and
  // the hash gate would blame the (correct) Spark answer (r16 advice).
  // Extra unrolled waves are free for DuckDB — once a wave adds nothing,
  // drop_i/keep_i are empty and res_i == res_{i-1}.
  private val OracleRounds = MaxRounds

  private def roundCtes: String = (1 to OracleRounds).map { i =>
    val p = s"res${i - 1}"
    s"""drop$i AS MATERIALIZED (
       |  SELECT DISTINCT e.d AS doc_id FROM edges e
       |  JOIN $p r ON e.e = r.doc_id AND r.kept
       |  WHERE e.d NOT IN (SELECT doc_id FROM $p)),
       |keep$i AS MATERIALIZED (
       |  SELECT i2.d AS doc_id FROM indeg i2
       |  JOIN (SELECT e.d, COUNT(*) AS nd FROM edges e
       |        JOIN $p r ON e.e = r.doc_id AND NOT r.kept GROUP BY e.d) dc
       |    ON dc.d = i2.d AND dc.nd = i2.n_earlier
       |  WHERE i2.d NOT IN (SELECT doc_id FROM $p)),
       |res$i AS MATERIALIZED (
       |  SELECT doc_id, kept, rnd FROM $p
       |  UNION ALL SELECT doc_id, FALSE AS kept, $i AS rnd FROM drop$i
       |  UNION ALL SELECT doc_id, TRUE AS kept, $i AS rnd FROM keep$i)""".stripMargin
  }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_dedup_first_wins",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |              CASE WHEN len(toks) >= 3
         |                   THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
         |                                      i -> array_to_string(toks[i:i+2], ' ')))
         |                   ELSE [] END AS shingles
         |       FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |qp AS (SELECT doc_a, doc_b FROM pairs
         |       JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |       WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= $MinJ),
         |edges AS (SELECT doc_a AS e, doc_b AS d FROM qp),
         |verts AS (SELECT DISTINCT v FROM (SELECT e AS v FROM edges
         |                                  UNION ALL SELECT d FROM edges)),
         |indeg AS (SELECT d, COUNT(*) AS n_earlier FROM edges GROUP BY 1),
         |res0 AS MATERIALIZED (
         |  SELECT v AS doc_id, TRUE AS kept, 0 AS rnd FROM verts
         |  WHERE v NOT IN (SELECT d FROM indeg)),
         |$roundCtes
         |SELECT doc_id, kept, CAST(rnd AS BIGINT) AS rnd
         |FROM res$OracleRounds ORDER BY doc_id""".stripMargin) { (s, d) =>
      resolveWaves(
        DedupQueries.nearDupPairs(Tables.documents(s, d), minJ = MinJ)
          .select(col("doc_a").as("e"), col("doc_b").as("d")))
    })

  /** The wave resolution over an explicit (e, d) earlier→later edge list
    * (e < d required) — shared by the gate and the randomized-property
    * spec. Returns (doc_id, kept, rnd) for every vertex.
    */
  private[graft] def resolveWaves(edges0: org.apache.spark.sql.DataFrame,
      maxRounds: Int = MaxRounds): org.apache.spark.sql.DataFrame = {
      val edges = edges0
        .stableCheckpoint() // read every wave — never regenerate the pairs
      val verts = edges.select(col("e").as("doc_id"))
        .union(edges.select(col("d"))).distinct()
      val indeg = edges.groupBy("d").agg(count(lit(1)).as("n_earlier"))
        .withColumnRenamed("d", "doc_id").stableCheckpoint()

      var resolved = verts.join(indeg, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(true).as("kept"), lit(0L).as("rnd"))
        .stableCheckpoint()
      var round = 1
      var added = 1L
      val total = verts.count()
      var resolvedCount = resolved.count()
      while (added > 0 && resolvedCount < total && round <= maxRounds) {
        val keptPrev = resolved.filter(col("kept")).select(col("doc_id").as("e"))
        val dropPrev = resolved.filter(!col("kept")).select(col("doc_id").as("e"))
        val unresolved = verts.join(resolved.select("doc_id"), Seq("doc_id"), "left_anti")
        val newDrop = unresolved
          .join(edges.join(keptPrev, "e").select(col("d").as("doc_id")).distinct(),
            Seq("doc_id"))
          .select(col("doc_id"), lit(false).as("kept"), lit(round.toLong).as("rnd"))
        val droppedEarlier = edges.join(dropPrev, "e")
          .groupBy("d").agg(count(lit(1)).as("nd"))
          .withColumnRenamed("d", "doc_id")
        val newKeep = unresolved
          .join(indeg, Seq("doc_id")).join(droppedEarlier, Seq("doc_id"))
          .filter(col("nd") === col("n_earlier"))
          .select(col("doc_id"), lit(true).as("kept"), lit(round.toLong).as("rnd"))
        val add = newDrop.union(newKeep).stableCheckpoint()
        added = add.count()
        if (added > 0) {
          resolved = resolved.union(add).stableCheckpoint()
          resolvedCount += added
          round += 1
        }
      }
      require(resolvedCount == total,
        s"first-wins dedup: $resolvedCount of $total vertices resolved after " +
          s"$round waves — dependency chain deeper than maxRounds=$maxRounds")
      resolved.orderBy("doc_id")
  }
}
