package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PERSISTED IVFPQ index serving (r15 verdict "what's missing" #2): the
  * r15 IVFPQ gates rebuild their index in-plan — every execution re-runs
  * coarse-centroid estimation plus two PQ Lloyd passes, so the bench
  * number was ~90% training and the persistence layer (the thing a real
  * serving stack lives on — FAISS writes the index ONCE and mmaps it)
  * was untested. This gate applies the [[BpeQueries.BpeVocabStore]]
  * pattern (train once, fingerprint-keyed parquet persist, serve from
  * the persisted copy, footer-digest invalidation) to the three IVFPQ
  * artifacts:
  *
  *  - coarse centroids (`cc`): nlists×64 integer per-list per-dim rows;
  *  - PQ codebooks (`cb`): m×16 sub-quantizer centroid rows;
  *  - coded lists (`codes`): one (vec_id, sub, code) row per subspace,
  *    stored WITH its list id — the scan side a probe prunes.
  *
  * All three pack into ONE long-typed store frame `(part, k1, k2, k3, v)`
  * so the artifact is a single keyed parquet write; the serving plan
  * unpacks by `part` filters that push into the scan. The store is keyed
  * by the EMBEDDINGS table's footer digest (`table = "embeddings"`), so
  * an in-place corpus regeneration invalidates exactly like the vocab
  * store's (same spec discipline).
  *
  * The SERVED plan therefore contains ZERO Lloyd stages — no assignment
  * argmin aggregates, no centroid re-estimation — only: coarse probe
  * (64-row query side vs broadcast nlists×64 centroids), distance table
  * (broadcast m×16), list-pruned codes scan (label-keyed broadcast
  * prune), bounded shortlist, and an exact refine that re-reads only the
  * R shortlisted raw vectors. IvfPqServeSpec pins all of that plus
  * train-once semantics and staleness invalidation.
  *
  * Parameters differ from the in-plan training face (`q_ann_ivfpq_topk`:
  * nprobe=2, R=50, top-10) — this gate probes nprobe=3 lists, shortlists
  * R=40, returns top-12 — so the two gates pin different probe/refine
  * decisions while sharing the byte-identical `pqCtes` training replay
  * in the oracle.
  */
object IvfPqServeQueries {

  private val NProbe = 3
  private val ShortR = 40
  private val TopK = 12

  /** The persisted index — trained at most once per (code version,
    * embeddings digest) across JVMs; see class doc for the row packing.
    */
  private[pipeline] def ivfPqIndex(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    BpeQueries.BpeVocabStore.artifact(spark, d, "ivfpq_m4_nl10",
        table = "embeddings") {
      val e = Tables.embeddings(spark, d)
      val comp = SimilarityQueries.quantizedComponents(e)
      val lab = e.select(col("vec_id"), col("label"))
      val cc = comp.join(lab, "vec_id")
        .groupBy("label", "i")
        .agg(expr("(SUM(v) * 100) DIV COUNT(1)").as("c"))
      val (c1, codes) = SimilarityQueries.pqTrain(comp)
      val listed = codes.join(lab, "vec_id")
      cc.select(lit("cc").as("part"), col("label").cast("long").as("k1"),
          col("i").cast("long").as("k2"), lit(null).cast("long").as("k3"),
          col("c").as("v"))
        .unionByName(c1.select(lit("cb").as("part"),
          col("cluster").cast("long").as("k1"), col("sub").cast("long").as("k2"),
          col("i").cast("long").as("k3"), col("c").as("v")))
        .unionByName(listed.select(lit("codes").as("part"),
          col("vec_id").as("k1"), col("sub").cast("long").as("k2"),
          col("cluster").cast("long").as("k3"), col("label").cast("long").as("v")))
    }

  /** The serving plan over the persisted store — the frame the gate and
    * the plan audit share.
    */
  private[pipeline] def serve(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val store = ivfPqIndex(spark, d)
    val cc = store.filter(col("part") === "cc")
      .select(col("k1").as("label"), col("k2").as("i"), col("v").as("c"))
    val cb = store.filter(col("part") === "cb")
      .select(col("k1").as("cluster"), col("k2").as("sub"),
        col("k3").as("i"), col("v").as("c"))
    val codes = store.filter(col("part") === "codes")
      .select(col("k1").as("vec_id"), col("k2").as("sub"),
        col("k3").as("cluster"), col("v").as("label"))
    val e = Tables.embeddings(spark, d)
    val comp = SimilarityQueries.quantizedComponents(e)
    val qt = comp.filter(col("vec_id") === 42)
      .select(col("sub"), col("i"), col("v").as("qv"))
    // coarse probe: integer L2 against the broadcast stored centroids
    val cd = qt.join(broadcast(cc), Seq("i"))
      .groupBy("label")
      .agg(sum((col("qv") * 100L - col("c")) * (col("qv") * 100L - col("c"))).as("dist"))
    val probed = cd.orderBy(col("dist"), col("label")).limit(NProbe)
      .select("label")
    // ADC distance table from the broadcast stored codebooks
    val dt = qt.join(broadcast(cb), Seq("sub", "i"))
      .groupBy("sub", "cluster")
      .agg(sum((col("qv") * 100L - col("c")) * (col("qv") * 100L - col("c"))).as("d"))
    // serving scan: ONLY the probed lists' codes
    val adc = codes.join(broadcast(probed), Seq("label"))
      .join(broadcast(dt), Seq("sub", "cluster"))
      .groupBy("vec_id")
      .agg(sum(col("d")).as("adc_dist"))
    val short = adc.orderBy(col("adc_dist"), col("vec_id")).limit(ShortR)
      .select("vec_id")
    // exact refine re-reads ONLY the R shortlisted raw vectors
    val rer = comp.join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qt.select(col("i"), col("qv"))), Seq("i"))
      .groupBy("vec_id")
      .agg(sum((col("v") - col("qv")) * (col("v") - col("qv"))).as("l2q_dist"))
    e.select(col("vec_id"), col("label"))
      .join(broadcast(rer), "vec_id")
      .select(col("vec_id"), col("label"), col("l2q_dist"))
      .orderBy(col("l2q_dist"), col("vec_id"))
      .limit(TopK)
  }

  private val BatchMod = 20
  private val BatchNProbe = 3
  private val BatchShortR = 16
  private val BatchTopK = 8

  /** Batched serving over the SAME persisted store: a query batch (every
    * [[BatchMod]]-th vector) rides ONE pruned codes scan — the
    * q_ann_ivfpq_batch law with the index build moved offline. Everything
    * query-sided stays broadcast-size (per-query probed lists, per-query
    * ADC tables); shortlists and the final top-k ride bounded kminBy
    * aggregates.
    */
  private[pipeline] def serveBatch(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val store = ivfPqIndex(spark, d)
    val cc = store.filter(col("part") === "cc")
      .select(col("k1").as("label"), col("k2").as("i"), col("v").as("c"))
    val cb = store.filter(col("part") === "cb")
      .select(col("k1").as("cluster"), col("k2").as("sub"),
        col("k3").as("i"), col("v").as("c"))
    val codes = store.filter(col("part") === "codes")
      .select(col("k1").as("vec_id"), col("k2").as("sub"),
        col("k3").as("cluster"), col("v").as("label"))
    val e = Tables.embeddings(spark, d)
    val comp = SimilarityQueries.quantizedComponents(e)
    val qb = comp.filter(col("vec_id") % BatchMod === 0)
      .select(col("vec_id").as("query_id"), col("sub"), col("i"),
        col("v").as("qv"))
    val cdq = qb.join(broadcast(cc), Seq("i"))
      .groupBy("query_id", "label")
      .agg(sum((col("qv") * 100L - col("c")) * (col("qv") * 100L - col("c"))).as("dist"))
    val prb = cdq.withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy("dist", "label")))
      .filter(col("rn") <= BatchNProbe).select("query_id", "label")
    val dtq = qb.join(broadcast(cb), Seq("sub", "i"))
      .groupBy("query_id", "sub", "cluster")
      .agg(sum((col("qv") * 100L - col("c")) * (col("qv") * 100L - col("c"))).as("d"))
    // ONE pass over the stored listed codes serves the whole batch
    val adc = codes.join(broadcast(prb), Seq("label"))
      .join(broadcast(dtq), Seq("query_id", "sub", "cluster"))
      .groupBy("query_id", "vec_id").agg(sum(col("d")).as("adc_dist"))
    val short = adc.groupBy("query_id")
      .agg(graft.functions.KMinAgg.kminBy(col("adc_dist"), col("vec_id"),
        BatchShortR).as("m"))
      .select(col("query_id"), explode(col("m")).as("x"))
      .select(col("query_id"), col("x.id").as("vec_id"))
    val rq = qb.select(col("query_id"), col("i"), col("qv"))
    val rer = comp.join(broadcast(short), Seq("vec_id"))
      .join(broadcast(rq), Seq("query_id", "i"))
      .groupBy("query_id", "vec_id")
      .agg(sum((col("v") - col("qv")) * (col("v") - col("qv"))).as("l2q_dist"))
    rer.groupBy("query_id")
      .agg(graft.functions.KMinAgg.kminBy(col("l2q_dist"), col("vec_id"),
        BatchTopK).as("m"))
      .select(col("query_id"), posexplode(col("m")).as(Seq("pos", "x")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("x.id").as("vec_id"), col("x.h").as("l2q_dist"))
      .orderBy("query_id", "rk")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_ivfpq_serve",
      s"""WITH ${SimilarityQueries.pqCtes},
         |lab AS (SELECT vec_id, label FROM embeddings),
         |cc AS (SELECT label, q.i, (SUM(q.v) * 100) // COUNT(*) AS c
         |       FROM q JOIN lab USING (vec_id) GROUP BY 1, 2),
         |cd AS (SELECT cc.label, SUM((qt.v*100 - cc.c) * (qt.v*100 - cc.c)) AS dist
         |       FROM qt JOIN cc ON qt.i = cc.i GROUP BY 1),
         |probed AS (SELECT label FROM cd ORDER BY dist, label LIMIT $NProbe),
         |adc AS (SELECT codes.vec_id, SUM(dt.d) AS adc_dist
         |        FROM codes
         |        JOIN lab ON codes.vec_id = lab.vec_id
         |        JOIN probed ON lab.label = probed.label
         |        JOIN dt ON codes.sub = dt.sub AND codes.cluster = dt.cluster
         |        GROUP BY 1),
         |short AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT $ShortR),
         |rer AS (SELECT q.vec_id, SUM((q.v - qt.v) * (q.v - qt.v)) AS dist
         |        FROM q JOIN short ON q.vec_id = short.vec_id
         |        JOIN qt ON q.i = qt.i
         |        GROUP BY 1)
         |SELECT r.vec_id, lab.label, CAST(r.dist AS BIGINT) AS l2q_dist
         |FROM rer r JOIN lab ON r.vec_id = lab.vec_id
         |ORDER BY r.dist, r.vec_id
         |LIMIT $TopK""".stripMargin) { (s, d) => serve(s, d) },

    QueryDef(
      "q_ann_ivfpq_serve_batch",
      s"""WITH ${SimilarityQueries.pqCtes},
         |lab AS (SELECT vec_id, label FROM embeddings),
         |cc AS (SELECT label, q.i, (SUM(q.v) * 100) // COUNT(*) AS c
         |       FROM q JOIN lab USING (vec_id) GROUP BY 1, 2),
         |qb AS (SELECT vec_id AS query_id, sub, i, v FROM q WHERE vec_id % $BatchMod = 0),
         |cdq AS (SELECT qb.query_id, cc.label,
         |               SUM((qb.v*100 - cc.c) * (qb.v*100 - cc.c)) AS dist
         |        FROM qb JOIN cc ON qb.i = cc.i GROUP BY 1, 2),
         |prb AS (SELECT query_id, label FROM (
         |          SELECT query_id, label,
         |                 ROW_NUMBER() OVER (PARTITION BY query_id
         |                                    ORDER BY dist, label) AS rn
         |          FROM cdq) WHERE rn <= $BatchNProbe),
         |dtq AS (SELECT qb.query_id, c1.sub, c1.cluster,
         |               SUM((qb.v*100 - c1.c) * (qb.v*100 - c1.c)) AS d
         |        FROM qb JOIN c1 ON qb.sub = c1.sub AND qb.i = c1.i
         |        GROUP BY 1, 2, 3),
         |adcb AS (SELECT dtq.query_id, codes.vec_id, SUM(dtq.d) AS adc_dist
         |         FROM codes
         |         JOIN lab ON codes.vec_id = lab.vec_id
         |         JOIN prb ON lab.label = prb.label
         |         JOIN dtq ON prb.query_id = dtq.query_id
         |                AND codes.sub = dtq.sub AND codes.cluster = dtq.cluster
         |         GROUP BY 1, 2),
         |shortb AS (SELECT query_id, vec_id FROM (
         |             SELECT query_id, vec_id,
         |                    ROW_NUMBER() OVER (PARTITION BY query_id
         |                                       ORDER BY adc_dist, vec_id) AS rn
         |             FROM adcb) WHERE rn <= $BatchShortR),
         |rerb AS (SELECT s.query_id, q.vec_id, SUM((q.v - qb.v) * (q.v - qb.v)) AS dist
         |         FROM q JOIN shortb s ON q.vec_id = s.vec_id
         |         JOIN qb ON qb.query_id = s.query_id AND q.i = qb.i
         |         GROUP BY 1, 2)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id,
         |       CAST(dist AS BIGINT) AS l2q_dist
         |FROM (SELECT query_id, vec_id, dist,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |                                ORDER BY dist, vec_id) AS rk
         |      FROM rerb)
         |WHERE rk <= $BatchTopK
         |ORDER BY query_id, rk""".stripMargin) { (s, d) => serveBatch(s, d) })
}
