package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the WordPiece encode gate (q_wordpiece_encode): bit-exact
  * agreement with an independent Scala greedy replay, the round-trip
  * identity, the char-fallback guarantee for training-alphabet words,
  * and the UNK law for foreign alphabets.
  */
class WordPieceSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val vocab: Seq[(String, Boolean, String)] =
    WordPieceQueries.vocabTable(spark, d).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSeq

  private lazy val encoded: Map[String, (Seq[String], Boolean)] =
    WordPieceQueries.encodedWords(spark, d).collect()
      .map(r => r.getString(0) -> (r.getSeq[String](1), r.getBoolean(2))).toMap

  /** Reference greedy longest-match: plain role at position 0,
    * continuation after; longest piece wins; any miss fails the word.
    */
  private def replay(word: String): (Seq[String], Boolean) = {
    val plain = vocab.collect { case (p, false, e) => p -> e }.toMap
    val cont = vocab.collect { case (p, true, e) => p -> e }.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val table = if (pos == 0) plain else cont
      val hit = (math.min(word.length - pos, vocab.map(_._1.length).max) to 1 by -1)
        .iterator.map(l => table.get(word.substring(pos, pos + l)))
        .collectFirst { case Some(e) => e }
      hit match {
        case None => return (Seq("[UNK]"), true)
        case Some(e) => out += e; pos += e.replace("#", "").length
      }
    }
    (out.toSeq, false)
  }

  test("gate encode equals the independent greedy replay on every word") {
    assert(encoded.nonEmpty)
    encoded.foreach { case (w, got) =>
      assert(got == replay(w), s"word '$w': $got vs ${replay(w)}")
    }
  }

  test("round-trip: non-UNK pieces reassemble the word; pieces are vocab emits") {
    val emits = vocab.map(_._3).toSet
    encoded.foreach { case (w, (pieces, unk)) =>
      if (!unk) {
        assert(pieces.map(_.replace("#", "")).mkString == w, s"round-trip '$w'")
        assert(pieces.head == pieces.head.replace("#", ""), s"'$w' starts ##")
        pieces.tail.foreach(p => assert(p.startsWith("##"), s"'$w' plain mid-word $p"))
      }
      pieces.foreach(p => assert(p == "[UNK]" || emits.contains(p), s"'$w': $p"))
    }
  }

  test("training-alphabet words never go UNK (char fallback); foreign letters must") {
    val trainChars = vocab.collect { case (p, false, _) if p.length == 1 => p.head }.toSet
    val (inAlpha, outAlpha) = encoded.keys.partition(_.forall(trainChars))
    assert(inAlpha.nonEmpty && outAlpha.nonEmpty, "both classes must occur")
    inAlpha.foreach(w => assert(!encoded(w)._2, s"'$w' went UNK inside the alphabet"))
    outAlpha.foreach(w => assert(encoded(w)._2, s"'$w' matched beyond the alphabet"))
  }
}
