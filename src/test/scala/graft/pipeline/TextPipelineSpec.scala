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
}
