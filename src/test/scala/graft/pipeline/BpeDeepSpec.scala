package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deep (batched) BPE trainer's law, pinned three ways:
  *
  *  1. the full distributed pass loop equals a from-scratch
  *     single-threaded reference of the SAME batched law (top-M rank
  *     scan, chain-greedy symbol-disjoint selection, single-fold batch
  *     application, closed-form site counts) at phrase level;
  *  2. batch = 1 degenerates EXACTLY to the classical greedy trainer
  *     ([[BpeQueries.trainTrace]]) at character level — the two
  *     independent code paths must produce identical traces;
  *  3. the batch-application fold's edge cases (l == r runs, adjacent
  *     disjoint merges, last-position bounds under ANSI).
  */
class BpeDeepSpec extends SparkSpec {

  // ---- single-threaded reference of the batched law: plain Scala ----
  private def refDeep(state0: Seq[(String, Long, Vector[String])],
      passes: Int, batch: Int, scan: Int, sep: String)
      : Seq[(Long, String, String, Long, Long, Long, Long)] = {
    var state = state0
    val out = Seq.newBuilder[(Long, String, String, Long, Long, Long, Long)]
    for (p <- 0 until passes) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (_, f, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { s =>
          cnt((s(0), s(1))) = cnt.getOrElse((s(0), s(1)), 0L) + f
        }
      }
      // greedy non-overlapping site count per pair, on the PRE-pass state
      val sites = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (_, f, syms) =>
        val inWord = syms.sliding(2).filter(_.size == 2)
          .map(s => (s(0), s(1))).toSet
        inWord.foreach { case (l, r) =>
          var i = 0; var c = 0L
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) { c += 1; i += 2 } else i += 1
          }
          sites((l, r)) = sites.getOrElse((l, r), 0L) + f * c
        }
      }
      val ranked = cnt.toSeq.map { case ((l, r), c) => (l, r, c) }
        .sortBy { case (l, r, c) => (-c, l, r) }.take(scan)
      val used = scala.collection.mutable.Set.empty[String]
      var n = 0
      val sel = ranked.flatMap { case t @ (l, r, _) =>
        if (n < batch && !used(l) && !used(r)) {
          used += l; used += r; n += 1; Some(t)
        } else None
      }
      val mp = sel.map { case (l, r, _) => (l, r) -> (l + sep + r) }.toMap
      state = state.map { case (w, f, syms) =>
        val o = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && mp.contains((syms(i), syms(i + 1)))) {
            o += mp((syms(i), syms(i + 1))); i += 2
          } else { o += syms(i); i += 1 }
        }
        (w, f, o.result())
      }
      val tAfter = state.map { case (_, f, s) => f * s.length }.sum
      val vAfter = state.flatMap(_._3).toSet.size.toLong
      sel.foreach { case (l, r, c) =>
        out += ((p.toLong, l, r, c, sites((l, r)), tAfter, vAfter))
      }
    }
    out.result()
  }

  private def collectTrace(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("phrase-level deep trace equals the single-threaded batched reference") {
    val dir = sf("sf0.001")
    val state0 = BpeQueries.deepPhraseState(
      spark.read.parquet(s"$dir/documents.parquet"))
    val got = collectTrace(
      BpeQueries.trainDeepTrace(state0, passes = 4, batch = 8,
        stage = false, sep = " "))
    val ref0 = state0.collect().map(r => (r.getString(0), r.getLong(1),
      r.getSeq[String](2).toVector)).toSeq
    val want = refDeep(ref0, passes = 4, batch = 8, scan = 512, sep = " ")
    assert(got == want)
  }

  test("batch = 1 equals the classical greedy trainer, column for column") {
    val dir = sf("sf0.001")
    val wf = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val charState0 = wf.select(col("word"), col("freq"),
      expr("filter(split(word, ''), c -> c <> '')").as("syms"))
    val deep = collectTrace(
      BpeQueries.trainDeepTrace(charState0, passes = 8, batch = 1,
        stage = false, sep = ""))
    val classical = collectTrace(
      BpeQueries.trainTrace(wf, rounds = 8, stage = false))
    assert(deep == classical,
      "B=1 deep trainer diverged from the classical greedy trainer")
  }

  test("run-free mask path equals the sequential fold on random words") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // symbol-disjoint run-free batch over a 6-symbol alphabet
    val batch = Seq(("a", "b"), ("c", "d"), ("e", "f"))
    // non-empty words only: state syms are never empty (merges keep ≥1
    // symbol), and sequence(1, 0) counts DOWN (the documented gotcha)
    val gen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.toSeq))
    val prop = Prop.forAllNoShrink(gen) { words =>
      val df = words.toDF("syms")
      val got = df.select(
          BpeQueries.applyBatchExpr(batch, sep = " ").as("mask"),
          BpeQueries.applyBatchFoldExpr(batch, sep = " ").as("fold"))
        .collect()
      got.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("deep vocab store: trains at most once, serves persisted phrase state") {
    val d = sf("sf0.001")
    val before = BpeQueries.BpeVocabStore.trainRuns
    val a = BpeQueries.BpeVocabStore.deepTrainedFinal(spark, d)
    val n1 = a.count()
    val afterFirst = BpeQueries.BpeVocabStore.trainRuns
    // a pre-existing cross-JVM persisted copy makes even the first call
    // free; a fresh target trains exactly once
    assert(afterFirst - before <= 1)
    val b = BpeQueries.BpeVocabStore.deepTrainedFinal(spark, d)
    assert(b.count() == n1)
    assert(BpeQueries.BpeVocabStore.trainRuns == afterFirst,
      "second deepTrainedFinal call retrained instead of serving the store")
    // the persisted state really carries learned PHRASE symbols
    assert(a.select(explode(col("syms")).as("s"))
      .filter(col("s").contains(" ")).count() > 0)
  }

  test("q_bpe_encode_deep: per-source accounting + top phrases served") {
    val rows = graft.SparkEntry.queries("q_bpe_encode_deep")(spark, sf("sf0.001"))
      .collect()
    val src = rows.filter(!_.getString(0).startsWith("top:"))
    val top = rows.filter(_.getString(0).startsWith("top:"))
    assert(src.length == 20 && top.length == 5, rows.map(_.getString(0)).mkString(","))
    src.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: tokens < docs")
    }
    assert(src.map(_.getLong(3)).sum > 0, "no phrases in the served encoding")
    top.foreach(r => assert(r.getString(0).contains(" ") && r.getLong(2) > 0))
  }

  test("deep OOV serving law: pass-batch replay of traced rules == trained final state") {
    // the q_bpe_encode_deep_oov contract: applying each pass's traced
    // rule batch with applyBatchExpr (the serving fold) to the TRAINING
    // state-0 must land exactly on the trainer's own final state — the
    // replay and the trainer are the same function, so unseen docs get
    // the same treatment seen docs got
    val d = sf("sf0.001")
    val trainDocs = graft.analytics.Tables.documents(spark, d)
      .filter(length(col("source")) === 4)
    def st0 = BpeQueries.deepPhraseState(trainDocs)
    val trace = BpeQueries.trainDeepTrace(st0, passes = 4, batch = 8,
      stage = false, sep = " ").collect()
    val batches = trace.map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).toSeq)
    assert(batches.size == 4 && batches.map(_.size).sum == trace.length)
    val replayed = batches.foldLeft(st0.select(col("word"), col("syms"))) {
      (df, b) => df.select(col("word"), BpeQueries.applyBatchExpr(b, " ").as("syms"))
    }.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val trained = BpeQueries.trainDeepFinalState(st0, passes = 4, batch = 8,
        stage = false, sep = " ")
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toSeq).toMap
    assert(replayed == trained,
      s"replay diverged on ${replayed.keySet.filter(k => replayed(k) != trained(k)).take(3)}")
  }

  test("q_bpe_encode_deep_oov: unseen sources compressed by phrases trained on seen ones") {
    val rows = graft.SparkEntry.queries("q_bpe_encode_deep_oov")(spark, sf("sf0.001"))
      .collect()
    val src = rows.filter(!_.getString(0).startsWith("top:"))
    val top = rows.filter(_.getString(0).startsWith("top:"))
    // exactly the 10 UNSEEN sources (src10..src19) and 5 top phrases
    assert(src.length == 10 && src.forall(_.getString(0).matches("src1\\d")),
      rows.map(_.getString(0)).mkString(","))
    assert(top.length == 5)
    src.foreach { r =>
      val (docs, raw, toks, phrases) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(docs > 0 && raw >= toks, s"${r.getString(0)}: encoding grew the text")
      // every phrase symbol of k words removes k-1 tokens (k >= 2), so
      // the token delta must cover at least one removal per phrase
      assert(raw - toks >= phrases,
        s"${r.getString(0)}: $phrases phrases but only ${raw - toks} tokens removed")
    }
    // the learned phrases actually FIRE on text the trainer never saw
    assert(src.map(_.getLong(4)).sum > 0, "no phrase generalized to unseen sources")
    assert(src.exists(_.getLong(5) < 1000L), "no source was compressed at all")
    top.foreach(r => assert(r.getString(0).contains(" ") && r.getLong(3) > 0))
  }

  test("batch fold: disjoint merges, l==r runs, bounds at the last position") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c", "d"),     // two disjoint merges in one word
      Seq("a", "a", "a"),          // l==r greedy run: merge 1, keep last
      Seq("c", "d", "a", "b"),     // order within word irrelevant
      Seq("x"),                    // no pair positions at all
      Seq("b", "a")).toDF("syms")  // (a,b) key looked up at last position
    val out = df.select(BpeQueries.applyBatchExpr(
        Seq(("a", "b"), ("c", "d"), ("a", "a")), sep = " ").as("o"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    // NOTE: (a,b) and (a,a) share a symbol and would never be selected
    // together by the trainer; the fold itself still resolves every
    // position by exact (sym, next) key — "a a a" hits (a,a) only
    assert(out == Seq(
      Seq("a b", "c d"),
      Seq("a a", "a"),
      Seq("c d", "a b"),
      Seq("x"),
      Seq("b", "a")))
  }
}
