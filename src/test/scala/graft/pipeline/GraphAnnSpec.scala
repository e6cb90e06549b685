package graft.pipeline

import graft.SparkSpec
import graft.functions.VectorFunctions.{dot, norm}
import org.apache.spark.sql.functions._

/** Laws of q_ann_graph_serve: recall floor against the exact brute-force
  * top-k (the approximation is pinned, not hidden), the ef-recall curve
  * (a wider beam strictly buys recall — the knob HNSW serving turns), a
  * corpus-independent search budget, a served plan that walks the
  * PERSISTED graph (no banding of the corpus in the serve path), and
  * train-once store semantics.
  *
  * Context for the floor: this corpus's neighborhoods are DIFFUSE (the
  * query's true top-10 sit at cosine ≈ 0.26–0.38 and are barely
  * adjacent to each other in the exact kNN graph), so graph search here
  * needs its full beam — the measured curve is 0.1 recall at beam 8 vs
  * 0.9 at beam 32. The law gated is the curve and the floor at the
  * served beam, not a fantasy floor at a budget the data can't support
  * (the Matryoshka-recall discipline).
  */
class GraphAnnSpec extends SparkSpec {

  private val d = sf("sf0.01")
  private val QueryId = 42L
  private val TopK = 10
  private val BudgetBound = 32 + 4 * 32 * 8 // entries + rounds×beam×K

  private lazy val served: Seq[Long] =
    graft.SparkEntry.queries("q_ann_graph_serve")(spark, d)
      .collect().map(_.getLong(0)).toSeq

  private lazy val brute: Seq[Long] = {
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val q = broadcast(e.filter(col("vec_id") === QueryId)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("nq")))
    e.filter(col("vec_id") =!= QueryId).crossJoin(q)
      .select(col("vec_id"),
        round(dot(col("embedding"), col("qv")) / (norm(col("embedding")) * col("nq"))
          * 1000000000L, 0).cast("long").as("cos_x1e9"))
      .orderBy(col("cos_x1e9").desc, col("vec_id")).limit(TopK)
      .collect().map(_.getLong(0)).toSeq
  }

  private def recallOf(ids: Iterable[Long]): Double =
    ids.toSet.intersect(brute.toSet).size.toDouble / TopK

  test("recall@10 vs exact brute force meets the floor at the served beam") {
    val recall = recallOf(served)
    info(s"graph-serve recall@10 = $recall")
    assert(recall >= 0.8, s"recall $recall (served=$served brute=$brute)")
  }

  test("ef-recall curve: widening the beam strictly buys recall") {
    val narrow = recallOf(GraphAnnQueries.beamVisited(spark, d, beam = 8, rounds = 4)
      .collect().map(_.getLong(0)))
    val wide = recallOf(GraphAnnQueries.beamVisited(spark, d)
      .collect().map(_.getLong(0)))
    info(s"visited-set recall: beam8=$narrow beam32=$wide")
    assert(wide > narrow, s"beam32 recall $wide not above beam8 $narrow")
    assert(wide >= 0.8, s"full-beam visited set misses the neighborhood: $wide")
  }

  test("search budget is corpus-independent: visited set within the static bound") {
    val visited = GraphAnnQueries.beamVisited(spark, d).count()
    assert(visited <= BudgetBound,
      s"visited $visited exceeds entries + rounds×beam×K = $BudgetBound")
  }

  test("served plan walks the persisted graph: store scan present, no banding, no corpus-wide scoring") {
    val df = GraphAnnQueries.beamVisited(spark, d)
    df.collect() // settle AQE; the store exists after the first run
    val p = df.queryExecution.executedPlan.toString
    val gate = graft.SparkEntry.queries("q_ann_graph_serve")(spark, d)
    gate.collect()
    val gp = gate.queryExecution.executedPlan.toString
    // no RP-LSH banding signature anywhere in the serve path
    assert(!p.contains("band_key") && !gp.contains("band_key"),
      "serve path re-bands the corpus — the graph must come from the store")
    // the final stage scores ONLY the staged/visited ids: its embeddings
    // join is id-keyed, not a corpus-wide cross product
    assert(!gp.contains("CartesianProduct"), gp.take(3000))
  }

  test("the graph trains at most once: a second serve reads the store") {
    GraphAnnQueries.beamVisited(spark, d).collect()
    val before = BpeQueries.BpeVocabStore.trainRuns
    graft.SparkEntry.queries("q_ann_graph_serve")(spark, d).collect()
    assert(BpeQueries.BpeVocabStore.trainRuns == before,
      "second serve rebuilt the neighbor graph")
  }
}
