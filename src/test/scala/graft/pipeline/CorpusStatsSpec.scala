package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Invariant checks for the corpus-statistics operators; exact-value
  * equivalence vs DuckDB is the driver gate's job (all five have oracle SQL).
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String): DataFrame =
    CorpusStatsQueries.defs.find(_.name == name).get.build(spark, sf())

  private def build(name: String, docs: DataFrame)(implicit s: SparkSession): DataFrame = {
    // run a def against an in-memory documents table by staging it as the
    // only parquet in a temp dir
    val dir = java.nio.file.Files.createTempDirectory("corpus-stats").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusStatsQueries.defs.find(_.name == name).get.build(s, dir)
  }

  test("lm familiarity: docs of rare bigrams score below docs of common ones") {
    // 6 docs repeat the same sentence (its bigrams reach corpus count ≥6);
    // one doc is unique gibberish (every bigram count = 1 → bucket 0)
    val common = (1L to 6L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en", "s", 43L))
    val docs = (common :+ ((7L, "zxq wvu tsr qpo nml kji", "en", "s", 23L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = build("q_lm_familiarity", docs)(spark)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(7L) == 0.0, s"unique-bigram doc must score 0, got ${rows(7L)}")
    assert(rows(1L) >= 2.0, s"repeated-sentence doc must score >= 2, got ${rows(1L)}")
    // ordering surface: the gibberish doc is the least familiar
    val first = build("q_lm_familiarity", docs)(spark).collect().head
    assert(first.getLong(0) == 7L)
  }

  test("repetition: degenerate docs are flagged, diverse docs kept") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "s", 50L),
      (2L, "one two three four five six seven eight nine ten eleven twelve", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = build("q_repetition_gopher", docs)(spark)
      .collect().map(r => r.getLong(0) -> r).toMap
    val spamRow = rows(1L)
    assert(spamRow.getDouble(2) == 1.0)  // max_tok_frac
    assert(spamRow.getDouble(3) == 1.0)  // top_2gram_frac
    assert(spamRow.getDouble(4) == 0.875) // dup_3gram_frac: 7 of 8 trigrams are repeats
    assert(!spamRow.getBoolean(5))       // keep = false
    val diverse = rows(2L)
    assert(diverse.getDouble(4) == 0.0)  // all trigrams distinct
  }

  test("repetition: fractions are in [0,1] and keep matches the thresholds") {
    val rows = q("q_repetition_gopher").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mt = r.getDouble(2)
      assert(mt >= 0 && mt <= 1)
      val t2 = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      val d3 = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      t2.foreach(v => assert(v >= 0 && v <= 1))
      d3.foreach(v => assert(v >= 0 && v <= 1))
      val expect = mt <= 0.11 && t2.forall(_ <= 0.06) && d3.forall(_ <= 0.2)
      assert(r.getBoolean(5) == expect)
    }
  }

  test("tfidf: rare terms outrank ubiquitous ones at equal term frequency") {
    // 'rare' appears once, only in doc 1; 'common' once in every doc →
    // same tf in doc 1, strictly higher idf for 'rare'
    val docs = Seq(
      (1L, "rare common alpha beta", "en", "s", 20L),
      (2L, "common gamma delta epsilon", "en", "s", 20L),
      (3L, "common zeta eta theta", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = build("q_tfidf_topk", docs)(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.length == 3)
    val rareScore = doc1.find(_._3 == "rare").get._4
    val commonScore = out.find(t => t._1 == 2L && t._3 == "common")
      .map(_._4).getOrElse(0.0)
    assert(rareScore > commonScore)
    // ranks are 1..3 and scores non-increasing within a doc
    out.groupBy(_._1).values.foreach { ds =>
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a._4 >= b._4 })
    }
  }

  test("vocab coverage: bounds hold and top vocabulary covers more than tail") {
    val rows = q("q_vocab_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cov) = (r.getLong(1), r.getLong(2))
      val (types, covTypes) = (r.getLong(3), r.getLong(4))
      assert(cov <= n && covTypes <= types && covTypes <= 16)
      val oov = r.getDouble(5)
      assert(oov >= 0.0 && oov <= 1.0)
      // top-16 of a ~31-type Zipf-ish corpus must cover the majority half
      assert(cov.toDouble / n > 0.3)
    }
  }

  test("train order: shards partition the corpus and the checksum pins order") {
    val rows = q("q_train_order").collect()
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.analytics.Tables.documents(spark, sf()).count()
    assert(total == nDocs)
    rows.foreach { r =>
      assert(r.getString(0).matches("[0-9a-f]{2}"))
      assert(r.getLong(1) >= 1)
    }
    // deterministic: two runs agree exactly (order is hash-derived, no rand)
    val again = q("q_train_order").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sketch stats: error-bound flags hold and exact columns are exact") {
    val rows = q("q_sketch_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"HLL out of 5% band: $r")
      assert(r.getBoolean(5), s"approx p50 out of 10% band: $r")
      assert(r.getLong(2) <= r.getLong(1)) // distinct <= docs
      assert(r.getDouble(4) > 0)
    }
  }

  test("mix temperature: over-represented strata are flattened, small kept whole") {
    val docs = (0L until 300L).map { i =>
      val lang = if (i < 260) "en" else "fr"
      (i, s"w$i", lang, "s", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = build("q_mix_temperature", docs)(spark).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (enN, enTarget, enSampled) = out("en")
    assert(enN == 260 && enTarget == 161) // floor(10*sqrt(260))
    // hash sampling realizes the rate to within a generous binomial band
    assert(math.abs(enSampled - enTarget) < 40)
    assert(enSampled < enN)
    val (frN, frTarget, frSampled) = out("fr")
    assert(frN == 40 && frTarget == 40 && frSampled == 40) // 10*sqrt(40)=63>40
  }
}
