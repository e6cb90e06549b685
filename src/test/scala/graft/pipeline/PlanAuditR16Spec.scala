package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Physical-plan audits for the round-16 additions: the scale shapes the
  * scaladocs claim, asserted against actual plans.
  *
  *  - q_decontaminate_semantic: the eval side is BROADCAST (band join and
  *    rescore) and nothing plans a cartesian corpus×corpus product.
  *  - q_eval_retrieval: per-query ranking is the bounded kminBy — no
  *    window operator (corpus-sized or otherwise) anywhere in the plan.
  *  - q_influence_scores: both readouts are TakeOrderedAndProject (never
  *    a global sort of the attribution frame).
  *  - q_triplet_mining: one corpus scan against the broadcast anchor
  *    batch (BroadcastNestedLoopJoin), arms selected in the typed
  *    aggregate (ObjectHashAggregate), no cartesian product.
  *  - q_multimodal_ahash: banded pair generation, never a cartesian
  *    product of the image corpus.
  */
class PlanAuditR16Spec extends SparkSpec {

  private def planOf(name: String): String = {
    val df: DataFrame = graft.SparkEntry.queries(name)(spark, sf())
    df.queryExecution.sparkPlan.toString
  }

  test("semantic decontamination broadcasts the eval side and never goes cartesian") {
    val p = planOf("q_decontaminate_semantic")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("retrieval eval ranks through the bounded aggregate - no window operator") {
    val p = planOf("q_eval_retrieval")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }

  test("influence readouts are TakeOrderedAndProject, not global sorts") {
    val p = planOf("q_influence_scores")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("triplet mining scans the corpus once against broadcast anchors") {
    val p = planOf("q_triplet_mining")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("perceptual-hash pair generation is banded, never cartesian") {
    val p = planOf("q_multimodal_ahash")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("embedding cluster assembly inherits the banded-pair shape, never cartesian") {
    val p = planOf("q_dedup_embedding_clusters")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
