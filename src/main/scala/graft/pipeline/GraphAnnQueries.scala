package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.functions.VectorFunctions.{dot, norm}
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-based ANN serving (HNSW-lite; r16 verdict "what's missing" #3):
  * the serving-latency regime where graph indexes win — high recall at a
  * LOW candidate count — had no face: IVF probes whole lists, PQ scans
  * coded lists; a neighbor-graph search touches only the vectors the
  * search actually walks.
  *
  * Two halves, split exactly like the IVFPQ serve face:
  *
  *  - CONSTRUCTION (offline, once per corpus): a symmetric kNN neighbor
  *    graph — RP-LSH banded candidates (adaptive banding, skew-guarded
  *    bucket pairs; never all-pairs), exact cosine re-score of candidates
  *    only, bounded top-[[GraphK]] per node via kminBy, symmetrized —
  *    persisted through the [[BpeQueries.BpeVocabStore]] keyed store
  *    (footer-digest invalidation, train-at-most-once), the same
  *    construction core as `PropagateQueries.annKnnEdges` with the
  *    serving out-degree.
  *  - SERVE (per query): multi-entry best-first beam search over the
  *    persisted graph: a fixed spread of entry points, then [[Rounds]]
  *    expand-score-prune rounds — expand the beam's neighbors (an id-keyed
  *    join against the stored adjacency), score ONLY the new candidates
  *    against the query (fixed-point ×10⁹ cosine), keep the best [[Beam]].
  *    Every frontier frame is ≤ Beam·GraphK rows, checkpointed per round
  *    (the PageRank lineage law); the vector fetches are id-keyed joins a
  *    real serving stack would back with a point-lookup store.
  *
  * Oracle: the search TRACE (the visited id set) is deterministic but the
  * hyperplane hashes behind the graph are not SQL-expressible, so the
  * gate follows the [[graft.OracleStage]] discipline — Verify stages the
  * visited ids and DuckDB independently re-scores the staged candidates
  * against the same query vector (cosine from raw floats) and re-derives
  * the top-k; the approximation itself is pinned by GraphAnnSpec's recall
  * floor against the exact brute-force top-k, and the serve plan is
  * audited to contain no banding/scoring of the corpus (graph from the
  * store, scores only on visited ids).
  */
object GraphAnnQueries {

  private val GraphK = 8 // out-degree of the persisted neighbor graph
  private val Beam = 32 // beam width kept between rounds (HNSW's ef)
  private val Rounds = 4 // expand/score/prune rounds
  private val TopK = 10
  private val QueryId = 42L
  private val EntryMod = 29 // entry stride; ≤32 fixed pivots at ANY corpus size

  /** The persisted symmetric neighbor graph (src, dst) — trained at most
    * once per (code version, embeddings digest).
    */
  private[graft] def neighborGraph(spark: SparkSession, d: String): DataFrame =
    BpeQueries.BpeVocabStore.artifact(spark, d, s"graphann_k$GraphK",
        table = "embeddings") {
      val e = Tables.embeddings(spark, d)
      val (bits, bands) = SimilarityQueries.adaptiveBanding(e.count())
      val banded = e.select(col("vec_id"),
        posexplode(SimilarityQueries.rpBandKeys(col("embedding"),
          bands = bands, rowsPerBand = bits)).as(Seq("band_id", "band_key")))
      val cand = LshBlocking
        .boundedBucketPairs(banded, Seq("band_id", "band_key"), "vec_id")
      val dir = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(cand.select(col("id_b").as("src"), col("id_a").as("dst")))
      val vecs = e.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      val kn = dir
        .join(vecs.select(col("vec_id").as("src"), col("embedding").as("ea"),
          col("nrm").as("na")), "src")
        .join(vecs.select(col("vec_id").as("dst"), col("embedding").as("eb"),
          col("nrm").as("nb")), "dst")
        .select(col("src"), col("dst"),
          round(dot(col("ea"), col("eb")) / (col("na") * col("nb"))
            * 1000000000L, 0).cast("long").as("cos_x1e9"))
        .groupBy("src")
        .agg(graft.functions.KMinAgg.kminBy(-col("cos_x1e9"), col("dst"), GraphK).as("mins"))
        .select(col("src"), explode(col("mins")).as("m"))
        .select(col("src"), col("m.id").as("dst"))
        .stableCheckpoint() // symmetrize reads it twice
      kn.unionByName(kn.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    }

  /** The visited id set of the beam search — the deterministic candidate
    * trace the final exact stage (and the oracle) re-scores.
    */
  private[graft] def beamVisited(spark: SparkSession, d: String,
      beam: Int = Beam, rounds: Int = Rounds): DataFrame = {
    // materialize the adjacency once per serve — every round joins it, and
    // re-reading the store parquet per round is pure repeated IO
    val g = neighborGraph(spark, d).stableCheckpoint()
    val e = Tables.embeddings(spark, d)
    val q = broadcast(e.filter(col("vec_id") === QueryId)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("nq")))
    // fixed-point query cosine for a bounded id frame — ids keyed into the
    // vector table, scored map-side against the 1-row broadcast query
    def score(ids: DataFrame): DataFrame = ids
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"),
        round(dot(col("embedding"), col("qv")) / (norm(col("embedding")) * col("nq"))
          * 1000000000L, 0).cast("long").as("cos_x1e9"))

    // ≤32 fixed pivot entries regardless of corpus size (the flat stand-in
    // for HNSW's hierarchical entry descent)
    val entries = e.filter(col("vec_id") % EntryMod === 0 &&
        col("vec_id") < EntryMod * 32 && col("vec_id") =!= QueryId)
      .select("vec_id")
    var visited = score(entries).stableCheckpoint()
    for (_ <- 1 to rounds) {
      val front = visited.orderBy(col("cos_x1e9").desc, col("vec_id")).limit(beam)
      val cand = g.join(front.select(col("vec_id").as("src")), "src")
        .select(col("dst").as("vec_id")).distinct()
        .join(visited.select("vec_id"), Seq("vec_id"), "left_anti")
        .filter(col("vec_id") =!= QueryId)
      visited = visited.unionByName(score(cand)).stableCheckpoint()
    }
    visited.select("vec_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_graph_serve",
      s"""WITH v AS (SELECT vec_id FROM ${graft.OracleStage.pq("visited_graphserve")}),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId)
         |SELECT e.vec_id, e.label,
         |       CAST(ROUND((${SimilarityQueries.cosSql("e.embedding", "qv")})
         |                  * 1000000000) AS BIGINT) AS cos_x1e9
         |FROM embeddings e JOIN v USING (vec_id), q
         |ORDER BY cos_x1e9 DESC, vec_id LIMIT $TopK""".stripMargin) { (s, d) =>
      val staged = graft.OracleStage.stage("visited_graphserve", beamVisited(s, d))
      val e = Tables.embeddings(s, d)
      val q = broadcast(e.filter(col("vec_id") === QueryId)
        .select(col("embedding").as("qv"), norm(col("embedding")).as("nq")))
      staged
        .join(e.select(col("vec_id"), col("label"), col("embedding")), "vec_id")
        .crossJoin(q)
        .select(col("vec_id"), col("label"),
          round(dot(col("embedding"), col("qv")) / (norm(col("embedding")) * col("nq"))
            * 1000000000L, 0).cast("long").as("cos_x1e9"))
        .orderBy(col("cos_x1e9").desc, col("vec_id"))
        .limit(TopK)
    })
}
