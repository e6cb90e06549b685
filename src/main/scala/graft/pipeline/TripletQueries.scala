package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.KMinAgg
import graft.functions.VectorFunctions.{dot, norm}
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.functions._

/** Contrastive-training triplet mining — the export face that turns the
  * similarity stack into (anchor, positive, hard negative) training rows
  * for embedding-model fine-tuning (the SimCSE / sentence-transformers
  * data recipe): per anchor, the positive is its nearest SAME-cluster
  * neighbor and the negative is the hardest (highest-cosine)
  * OTHER-cluster neighbor — the near-boundary negatives that actually
  * move a contrastive loss, mined from the same integer-Lloyd clusters
  * the hard-negative gates use.
  *
  * Scale shape: the anchor batch is FIXED (20 ids — a training batch,
  * not a corpus slice, so the corpus-sized work stays linear: one scan
  * scoring every row against the broadcast anchors). Positive and
  * negative are selected in the SAME bounded aggregate — two
  * null-guarded kminBy(1) branches (KMinAgg skips null inputs), so no
  * second pass, no corpus window, no join between arms. Cosines ride
  * the ×10⁹ fixed point; margins are integer subtraction.
  */
object TripletQueries {

  private val AnchorEvery = 25
  private val AnchorMax = 500L // 20 anchors at every scale factor

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_triplet_mining",
      s"""WITH ${SimilarityQueries.kmeansCtes},
         |a AS (SELECT a2.vec_id AS aid, a2.cluster AS acl, e.embedding AS aemb
         |      FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id
         |      WHERE a2.vec_id % $AnchorEvery = 0 AND a2.vec_id < $AnchorMax),
         |p AS (SELECT a.aid, a.acl, b.vec_id, b.cluster AS cl,
         |             CAST(ROUND((${SimilarityQueries.cosSql("e.embedding", "aemb")})
         |                        * 1000000000) AS BIGINT) AS cos_x1e9
         |      FROM a JOIN a2 b ON b.vec_id <> a.aid
         |      JOIN embeddings e ON e.vec_id = b.vec_id),
         |pos AS (SELECT aid, vec_id AS pos_id, cos_x1e9 AS pos_cos_x1e9 FROM (
         |          SELECT aid, vec_id, cos_x1e9,
         |                 ROW_NUMBER() OVER (PARTITION BY aid
         |                                    ORDER BY cos_x1e9 DESC, vec_id) AS rn
         |          FROM p WHERE cl = acl) WHERE rn = 1),
         |neg AS (SELECT aid, vec_id AS neg_id, cos_x1e9 AS neg_cos_x1e9 FROM (
         |          SELECT aid, vec_id, cos_x1e9,
         |                 ROW_NUMBER() OVER (PARTITION BY aid
         |                                    ORDER BY cos_x1e9 DESC, vec_id) AS rn
         |          FROM p WHERE cl <> acl) WHERE rn = 1)
         |SELECT pos.aid AS anchor_id, pos_id, pos_cos_x1e9,
         |       neg_id, neg_cos_x1e9,
         |       pos_cos_x1e9 - neg_cos_x1e9 AS margin_x1e9
         |FROM pos JOIN neg USING (aid)
         |ORDER BY anchor_id""".stripMargin) { (s, d) =>
      tripletsOf(Tables.embeddings(s, d))
    })

  /** The full mining pipeline over an explicit embeddings frame — shared
    * by the gate and the ×10 scale probe (corpus grows, anchor batch
    * stays the fixed 20 ids).
    */
  private[graft] def tripletsOf(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      // assignments feed the anchor table AND the corpus side — run the
      // Lloyd rounds once
      val asg = SimilarityQueries.kmeansAssignments(e, k = 8)
        .select("vec_id", "cluster").stableCheckpoint()
      val v = e.join(asg, "vec_id")
        .select(col("vec_id"), col("cluster"), col("embedding"),
          norm(col("embedding")).as("nrm"))
      val anchors = broadcast(v
        .filter(col("vec_id") % AnchorEvery === 0 && col("vec_id") < AnchorMax)
        .select(col("vec_id").as("aid"), col("cluster").as("acl"),
          col("embedding").as("aemb"), col("nrm").as("anrm")))

      // ONE corpus scan: score against the broadcast anchor batch, then
      // select positive and hard negative in the same bounded aggregate —
      // null-guarded kminBy(1) branches (nulls are skipped)
      val scoredTriplets = v.crossJoin(anchors)
        .filter(col("vec_id") =!= col("aid"))
        .select(col("aid"), col("acl"), col("vec_id"), col("cluster"),
          round(dot(col("embedding"), col("aemb")) / (col("nrm") * col("anrm"))
            * 1000000000L, 0).cast("long").as("cos_x1e9"))
        .groupBy("aid")
        .agg(
          KMinAgg.kminBy(when(col("cluster") === col("acl"), -col("cos_x1e9")),
            when(col("cluster") === col("acl"), col("vec_id")), 1).as("pos"),
          KMinAgg.kminBy(when(col("cluster") =!= col("acl"), -col("cos_x1e9")),
            when(col("cluster") =!= col("acl"), col("vec_id")), 1).as("neg"))

      // degenerate anchors (no same-cluster or no other-cluster neighbor)
      // have an empty kminBy arm; emit NOTHING for them — getItem(0) on the
      // empty array would yield a NULL-margin row where the oracle's inner
      // JOIN pos/neg drops the anchor entirely (r16 advice)
      scoredTriplets
        .filter(size(col("pos")) > 0 && size(col("neg")) > 0)
        .select(col("aid").as("anchor_id"),
          col("pos")(0).getField("id").as("pos_id"),
          (-col("pos")(0).getField("h")).as("pos_cos_x1e9"),
          col("neg")(0).getField("id").as("neg_id"),
          (-col("neg")(0).getField("h")).as("neg_cos_x1e9"))
        .withColumn("margin_x1e9", col("pos_cos_x1e9") - col("neg_cos_x1e9"))
        .orderBy("anchor_id")
  }
}
