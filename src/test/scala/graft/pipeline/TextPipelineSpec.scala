package graft.pipeline

import graft.SparkSpec

/** Text-pipeline edge cases the synthetic corpus doesn't exercise. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("langid classifies NULL-text and empty-text docs as 'en' (not dropped)") {
    // A NULL text must not vanish at the explode: the sentinel row keeps the
    // doc alive and zero marker hits classify it 'en' — the same behavior as
    // the DuckDB oracle and the original HOF langIdHeuristic.
    val docs = Seq(
      (1L, "en", Option("the cat of the house and the dog")),
      (2L, "es", Option("el perro y la casa de la playa")),
      (3L, "xx", None),               // NULL text
      (4L, "yy", Option("")),         // empty text
      (5L, "zz", Option("w1 w2 w3")) // no markers at all
    ).toDF("doc_id", "lang", "text")
    val out = TextPipelineQueries.langIdBreakdown(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(
      ("en", "en", 1L), ("es", "es", 1L),
      ("xx", "en", 1L), ("yy", "en", 1L), ("zz", "en", 1L)),
      s"got ${out.mkString(", ")}")
  }

  test("quality classifier: prose-like docs keep, degenerate docs reject") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qc").toString
    val prose = "the table of the part and the line is a key to the scan " +
      "and the window of the stream is a filter in the batch of the merge " +
      "and the column is a vector in the group of the sort and the query " +
      "is a value of the hash and the customer is a row in the order"
    Seq(
      (1L, prose, "en", "s", prose.length.toLong),           // stopword-rich, long
      (2L, "x y z", "en", "s", 5L),                          // too short, no stopwords
      (3L, "zz zz zz zz zz zz zz zz zz zz", "en", "s", 29L)) // no stopwords, short toks
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows(1L)._2, s"prose doc must keep: logit=${rows(1L)._1}")
    assert(!rows(2L)._2, s"3-token doc must reject: logit=${rows(2L)._1}")
    assert(!rows(3L)._2, s"stopword-free doc must reject: logit=${rows(3L)._1}")
    // decision is the sign of the integer logit — no float anywhere
    rows.values.foreach { case (logit, keep) => assert(keep == (logit >= 0)) }
  }
}
