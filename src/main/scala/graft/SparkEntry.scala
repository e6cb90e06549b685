package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) is one entry in [[queries]]; entries
  * with a DuckDB-expressible equivalent also appear in [[oracleSql]] for the
  * driver's hash-match correctness gate.
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] =
    analytics.RelationalQueries.defs ++
      analytics.CdcShapeQueries.defs ++
      analytics.SequenceQueries.defs ++
      analytics.GraphQueries.defs ++
      analytics.ProfileQueries.defs ++
      analytics.LayoutQueries.defs ++
      pipeline.TextPipelineQueries.defs ++
      pipeline.DedupQueries.defs ++
      pipeline.ContainmentQueries.defs ++
      pipeline.FirstWinsDedupQueries.defs ++
      pipeline.SimilarityQueries.defs ++
      pipeline.SemanticDeconQueries.defs ++
      pipeline.EmbeddingClusterQueries.defs ++
      pipeline.TripletQueries.defs ++
      pipeline.IvfPqServeQueries.defs ++
      pipeline.GraphAnnQueries.defs ++
      pipeline.Multimodal.defs ++
      pipeline.CorpusPipeline.defs ++
      pipeline.CorpusStatsQueries.defs ++
      pipeline.RetrievalQueries.defs ++
      pipeline.RetrievalEvalQueries.defs ++
      pipeline.PcaQueries.defs ++
      pipeline.BpeQueries.defs ++
      pipeline.BpeOovQueries.defs ++
      pipeline.WordPieceQueries.defs ++
      pipeline.UnigramQueries.defs ++
      pipeline.ChunkingQueries.defs ++
      pipeline.QualityGateQueries.defs ++
      pipeline.SelectionQueries.defs ++
      pipeline.PerceptronQueries.defs ++
      pipeline.LinearProbeQueries.defs ++
      pipeline.InfluenceQueries.defs ++
      pipeline.IncrementalIvfQueries.defs ++
      pipeline.IncrementalPipelineQueries.defs ++
      pipeline.PropagateQueries.defs ++
      pipeline.EvalQueries.defs ++
      operators.RangeJoin.defs ++
      plans.RollupRewrite.defs ++
      streaming.StreamShapeQueries.defs ++
      sources.FormatSources.defs ++
      analytics.HealthcareEntry.defs ++
      semantic.RefModelQueries.defs

  // A duplicate name would silently shadow the earlier query in the
  // registry Map (it happened once: two files both claimed
  // "q_split_stratified" and the train/val/test split vanished from the
  // driver's gate). Fail loudly at class-init instead.
  require(
    allDefs.map(_.name).distinct.size == allDefs.size, {
      val dups = allDefs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
      s"duplicate query names in registry: ${dups.mkString(", ")}"
    })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + exact-decimal aggregation + top-k — the
    * engine's bread-and-butter plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the probabilistic operators
    * (MinHash-LSH, SimHash, IVF) → driver records a rows-only check;
    * their exactness is asserted against in-repo baselines by ScalaTest.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
