package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.functions._

/** Training-data attribution — gradient-alignment influence scores
  * (TracIn, Pruthi et al. 2020, one-checkpoint form) over the ridge
  * probe's linear model: for squared loss the gradient at example i is
  * (ŷᵢ − yᵢ)·xᵢ, so the influence of TRAIN example i on the VALIDATION
  * set is the dot product
  *   infl(i) = (ŷᵢ − yᵢ) · ⟨xᵢ, g⟩,   g = Σ_val (ŷᵥ − yᵥ)·xᵥ
  * A descent step on i changes validation loss by −η·infl(i), so
  * POSITIVE infl = aligned gradients = the step REDUCES validation loss
  * (a proponent/helpful example); negative = an opponent whose gradient
  * pushes validation loss up (the harmful-data signal pipelines prune
  * on). This is the selection family's attribution face: DSIR weighs by
  * distribution match, influence weighs by effect on a held-out
  * objective.
  *
  * Distributed shape (the q_linear_probe discipline, one stricter): the
  * probe weights come from the bounded Gramian solve on the TRAIN split;
  * then (1) the 65-cell validation gradient g is ONE map-side-combined
  * aggregate over the val split, (2) g is collected (65 longs — bounded,
  * corpus-independent) and re-enters as a broadcast literal, so the
  * scoring/attribution pass over the train split is PURE MAP (two
  * codegen'd array folds per row against literal vectors), and (3) the
  * two top-25 readouts are TakeOrderedAndProject. The corpus is never
  * shuffled after the Gramian.
  *
  * Exactness: x, y are the probe's integers; weights are the staged
  * ⌊w·2³⁰⌋ quantization; residuals are s − y·2³⁰ (×2³⁰ fixed point).
  * Descaling is explicit integral division at two points — g DIV 2³⁰
  * before the dot (else ⟨x, g⟩ overflows BIGINT at ~10⁴ val rows) and
  * r DIV 2¹², ⟨x, g'⟩ DIV 2¹² before the product (headroom to ~10⁶
  * rows; both engines truncate signed DIV toward zero — verified). The
  * oracle recomputes the split, residuals, g, the descaled dots, and
  * both rankings from the staged weights, so every attribution integer
  * is hash-gated.
  */
object InfluenceQueries {

  private val Dim = 64
  private val Q = 10000L
  private val WScale = 1L << 30
  private val TopN = 25

  /** [bias; quantized components] — the probe's feature map. */
  private def xCol = expr(
    s"concat(array(${Q}L), transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * $Q, 0) AS BIGINT)))")

  private def oracleSql: String =
    s"""WITH ${SimilarityQueries.kmeansCtes},
       |yv AS (SELECT a2.vec_id,
       |              CASE WHEN a2.cluster = 0 THEN 1 ELSE -1 END AS y
       |       FROM a2),
       |xv AS (SELECT q.vec_id, q.i, q.v - 10000 AS x FROM q
       |       UNION ALL SELECT vec_id, 0 AS i, $Q AS x FROM yv),
       |w AS (SELECT dim, wq FROM ${graft.OracleStage.pq("infl_w")}),
       |sc AS (SELECT xv.vec_id, CAST(SUM(xv.x * w.wq) AS BIGINT) AS s
       |       FROM xv JOIN w ON w.dim = xv.i GROUP BY 1),
       |r AS (SELECT sc.vec_id, sc.s - yv.y * $WScale AS r,
       |             (sc.vec_id % 10 = 3) AS is_val
       |      FROM sc JOIN yv USING (vec_id)),
       |g AS (SELECT xv.i, CAST(SUM(r.r * xv.x) AS BIGINT) // $WScale AS gs
       |      FROM r JOIN xv USING (vec_id) WHERE r.is_val GROUP BY 1),
       |dotg AS (SELECT xv.vec_id, CAST(SUM(xv.x * g.gs) AS BIGINT) AS xg
       |         FROM xv JOIN g ON g.i = xv.i GROUP BY 1),
       |infl AS (SELECT r.vec_id,
       |                CAST((r.r // 4096) * (dotg.xg // 4096) AS BIGINT) AS infl
       |         FROM r JOIN dotg USING (vec_id) WHERE NOT r.is_val),
       |help AS (SELECT 'helpful' AS kind,
       |                ROW_NUMBER() OVER (ORDER BY infl DESC, vec_id) AS rnk,
       |                vec_id, infl
       |         FROM infl QUALIFY rnk <= $TopN),
       |harm AS (SELECT 'harmful' AS kind,
       |                ROW_NUMBER() OVER (ORDER BY infl ASC, vec_id) AS rnk,
       |                vec_id, infl
       |         FROM infl QUALIFY rnk <= $TopN)
       |SELECT kind, CAST(rnk AS BIGINT) AS rnk, vec_id, infl
       |FROM (SELECT * FROM help UNION ALL SELECT * FROM harm)
       |ORDER BY kind, rnk""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ----- TracIn-style influence: top-25 helpful + top-25 harmful -----
    QueryDef("q_influence_scores", oracleSql) { (spark, d) =>
      influenceOf(spark, Tables.embeddings(spark, d))
    })

  /** The full attribution pipeline over an explicit embeddings frame —
    * shared by the gate and the ×10 scale probe.
    */
  private[graft] def influenceOf(spark: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val y = SimilarityQueries.kmeansAssignments(e, k = 8)
        .select(col("vec_id"),
          when(col("cluster") === 0, 1L).otherwise(-1L).as("y"))
      // consumed by the Gramian, the moment, g, and the attribution pass —
      // checkpoint so Lloyd + quantization run once
      val xy = e.select(col("vec_id"), xCol.as("x")).join(y, "vec_id")
        .withColumn("is_val", col("vec_id") % 10 === 3)
        .stableCheckpoint()

      // weights from the TRAIN split only (validation stays held out of
      // the solve, as an attribution target must)
      val wq = LinearProbeQueries.trainWeights(spark,
        xy.filter(!col("is_val")))
      graft.OracleStage.stage("infl_w", wq.toDF("dim", "wq"))
      val wLit = wq.map(_._2).mkString("array(", "L, ", "L)")

      val scored = xy.select(col("vec_id"), col("x"), col("is_val"),
        (expr(s"aggregate(zip_with(x, $wLit, (a, b) -> a * b), 0L, (acc, e) -> acc + e)")
          - col("y") * WScale).as("r"))

      // validation gradient: 65 cells, map-side combined, then collected
      // (bounded, corpus-independent) and re-broadcast as a literal
      val g = scored.filter(col("is_val"))
        .select(col("r"), posexplode(col("x")).as(Seq("i", "xv")))
        .groupBy("i").agg(sum(col("r") * col("xv")).as("srx"))
        .select(col("i"), expr(s"srx DIV ${WScale}L").as("gs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val gArr = (0 to Dim).map(i => g.getOrElse(i, 0L))
      val gLit = gArr.mkString("array(", "L, ", "L)")

      // attribution pass: pure map over the train split — fold against
      // the g literal, two signed truncating descales, then two bounded
      // TakeOrderedAndProject readouts
      val infl = scored.filter(!col("is_val"))
        .select(col("vec_id"),
          (expr("r DIV 4096") *
            expr(s"aggregate(zip_with(x, $gLit, (a, b) -> a * b), 0L, (acc, e) -> acc + e) DIV 4096"))
            .as("infl"))
        .stableCheckpoint() // two readouts — score once

      val help = infl.orderBy(col("infl").desc, col("vec_id")).limit(TopN)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("infl").desc, col("vec_id"))).cast("long"))
        .select(lit("helpful").as("kind"), col("rnk"), col("vec_id"), col("infl"))
      val harm = infl.orderBy(col("infl").asc, col("vec_id")).limit(TopN)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("infl").asc, col("vec_id"))).cast("long"))
        .select(lit("harmful").as("kind"), col("rnk"), col("vec_id"), col("infl"))
      help.union(harm).orderBy("kind", "rnk")
  }
}
