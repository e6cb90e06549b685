package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BpeOovQueries]]' serving laws:
  *
  *  1. replay == lookup on SEEN words: rank-ordered rule replay over a
  *     training word's characters reproduces the trained state's
  *     tokenization exactly (the fast-path/OOV-path equivalence the
  *     production composition rests on);
  *  2. unseen characters pass through untouched (no rule matches them)
  *     and unseen words still tokenize — nothing is dropped;
  *  3. the replay chain's plan is LINEAR in the rule count: Catalyst
  *     must keep one projection per rule, not inline each fold into the
  *     next (which would rebuild the expression 6× per level — an
  *     exponential tree);
  *  4. the registered gate reports real OOV on the fixture: the foreign
  *     part_names domain has out-of-vocabulary words AND out-of-alphabet
  *     symbols ('z' never occurs in the training source).
  */
class BpeOovSpec extends SparkSpec {

  private def rules8(d: String): Seq[(String, String)] =
    BpeOovQueries.trainedRules(spark, d).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  test("replay over training words equals the trained state's tokenization") {
    val d = sf("sf0.001")
    val rules = rules8(d)
    val wfA = BpeQueries.wordFreq(spark, d, Some("src0"))
    val trained = BpeQueries.trainedState(wfA, rounds = 8, stage = false)
      .select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val replayed = BpeOovQueries.replayEncode(wfA.select("word"), rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(trained.nonEmpty && replayed == trained,
      "rule replay diverged from the trained tokenization on seen words")
  }

  test("unseen words and unseen characters tokenize without loss") {
    import spark.implicits._
    val d = sf("sf0.001")
    val rules = rules8(d)
    val out = BpeOovQueries.replayEncode(
        Seq("zzz", "qqazb", "a").toDF("word"), rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    // every input character survives (concatenation identity)
    out.foreach { case (w, syms) => assert(syms.mkString == w, s"$w -> $syms") }
    // 'z' is outside the training alphabet: no rule ever merges it with
    // anything, so a pure-z word stays fully exploded
    assert(out("zzz") == Seq("z", "z", "z"))
  }

  test("replay plan is linear in the rule count (no project inlining)") {
    val d = sf("sf0.001")
    val rules = rules8(d)
    // parquet-backed input — a literal local relation would constant-fold
    // the whole chain away and prove nothing
    val words = BpeQueries.wordFreq(spark, d).select("word")
    val df = BpeOovQueries.replayEncode(words, rules)
    val plan = df.queryExecution.optimizedPlan.toString
    // one greedy fold per rule — inlining would square the count per level
    val folds = "aggregate\\(sequence".r.findAllIn(plan).size
    assert(folds == rules.size, s"expected ${rules.size} fold sites, got $folds:\n${plan.take(2000)}")
    assert(plan.length < 200000, s"plan string blew up: ${plan.length} chars")
  }

  test("the registered gate reports real OOV for the foreign domain") {
    val rows = graft.SparkEntry.queries("q_bpe_encode_oov")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nW, nOovW, nT, nOovT) = rows("part_names")
    assert(nW > 0 && nT >= nW)
    assert(nOovW > 0, "part_names must contain out-of-vocabulary words")
    assert(nOovT > 0, "part_names must contain out-of-alphabet ('z') tokens")
    // training-corpus sources share the fixture vocabulary: their only
    // OOV words are the length-1 tokens the training filter excluded
    val (srcW, srcOovW, _, srcOovT) = rows("src1")
    assert(srcW > 0 && srcOovT == 0L)
    assert(srcOovW >= 0L && srcOovW < srcW)
  }
}
