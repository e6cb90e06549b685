package graft.pipeline

import graft.SparkSpec

/** r18 (r17 verdict "what's wrong" #4): `DedupQueries.shinglePostings`
  * derives DISTINCT (doc_id, sh) postings per row (array_distinct within a
  * doc), which is only the global distinct set when callers feed KEY-UNIQUE
  * doc_id rows. This spec arms the in-code debug assert and drives every
  * registered consumer query through it at sf0.001 — a call site that can
  * feed duplicate ids fails here with an explicit message instead of
  * silently double-counting postings in production.
  */
class ShinglePostingsContractSpec extends SparkSpec {

  // every registered query whose plan reaches shinglePostings, directly or
  // through nearDupPairs*/containment/pipeline wrappers
  private val consumers = Seq(
    "q_dedup_ngram_jaccard", "q_dedup_prefix_filter", "q_dedup_incremental",
    "q_dedup_containment", "q_decontaminate", "q_decontaminate_bloom",
    "q_corpus_clean", "q_pipeline_incremental")

  test("every shinglePostings call site feeds key-unique doc_id rows") {
    System.setProperty("graft.debug.assertUniqueDocs", "1")
    try consumers.foreach { q =>
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect()
    } finally System.clearProperty("graft.debug.assertUniqueDocs")
  }

  test("the assert itself fires on a duplicate-id frame") {
    import spark.implicits._
    System.setProperty("graft.debug.assertUniqueDocs", "1")
    try {
      val dup = Seq((1L, "a b c d"), (1L, "a b c e")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        DedupQueries.shinglePostings(dup)
      }
      assert(e.getMessage.contains("duplicate doc_id"))
    } finally System.clearProperty("graft.debug.assertUniqueDocs")
  }
}
