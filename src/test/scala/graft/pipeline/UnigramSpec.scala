package graft.pipeline

import graft.SparkSpec

/** Laws of the unigram-LM Viterbi gate (q_unigram_encode): bit-exact
  * agreement with an independent Scala Viterbi, GLOBAL optimality of the
  * segmentation cost, the round-trip identity, and the UNK law.
  */
class UnigramSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val costs: Map[String, Long] =
    UnigramQueries.costTable(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val encoded: Map[String, (Seq[String], Boolean, Long)] =
    UnigramQueries.encodedWords(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[String](1), r.getBoolean(2), r.getLong(3)))).toMap

  private val Inf = 1000000000000000L

  /** Independent Viterbi with the gate's tie law (score ASC, len DESC). */
  private def replay(word: String): (Seq[String], Boolean, Long) = {
    val maxLen = costs.keys.map(_.length).max
    val n = word.length
    val dp = Array.fill(n + 1)(0L)
    val bp = Array.fill(n + 1)(0)
    for (j <- 1 to n) {
      var best = Long.MaxValue; var bestL = 0
      for (l <- maxLen to 1 by -1 if l <= j) {
        costs.get(word.substring(j - l, j)).foreach { c =>
          val cand = dp(j - l) + c
          if (cand < best) { best = cand; bestL = l } // len DESC on ties
        }
      }
      if (bestL == 0) { dp(j) = Inf + dp(j - 1); bp(j) = 0 }
      else { dp(j) = best; bp(j) = bestL }
    }
    if (dp(n) >= Inf) (Seq("[UNK]"), true, 0L)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { out.prepend(word.substring(p - bp(p), p)); p -= bp(p) }
      (out.toSeq, false, dp(n))
    }
  }

  test("gate Viterbi equals the independent replay on every word") {
    assert(encoded.nonEmpty)
    encoded.foreach { case (w, got) =>
      assert(got == replay(w), s"word '$w': $got vs ${replay(w)}")
    }
  }

  test("optimality: gate cost never exceeds the all-chars segmentation cost") {
    encoded.foreach { case (w, (pieces, unk, cost)) =>
      if (!unk) {
        val charCost = w.map(c => costs(c.toString)).sum
        assert(cost <= charCost, s"'$w': $cost > chars $charCost")
        // and the reported cost IS the sum of the reported pieces' costs
        assert(cost == pieces.map(costs).sum, s"'$w' cost mismatch")
      }
    }
  }

  test("round-trip identity and the foreign-alphabet UNK law") {
    val alpha = costs.keys.filter(_.length == 1).map(_.head).toSet
    var unks = 0
    encoded.foreach { case (w, (pieces, unk, _)) =>
      if (!unk) assert(pieces.mkString == w, s"round-trip '$w'")
      if (w.forall(alpha)) assert(!unk, s"'$w' went UNK inside the alphabet")
      else { assert(unk, s"'$w' matched beyond the alphabet"); unks += 1 }
    }
    assert(unks > 0, "the foreign domain must exercise the UNK path")
  }
}
