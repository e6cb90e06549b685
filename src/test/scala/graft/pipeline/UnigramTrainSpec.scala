package graft.pipeline

import graft.SparkSpec

/** Laws of the unigram-LM EM trainer (q_unigram_train): the whole loop —
  * seed inventory, per-pass Viterbi E-step, driver-side ln M-step, EM
  * death and bottom-count prune — replays independently in plain Scala
  * bit-for-bit; the pure-EM passes are monotone non-increasing in corpus
  * cost; the prune passes shrink the inventory by exactly the budget;
  * every pass's segmentation is DP-optimal (≤ the all-chars cost).
  */
class UnigramTrainSpec extends SparkSpec {

  private val d = sf("sf0.001")
  // mirror the gate's constants (independent literals, not references)
  private val Passes = 6
  private val SeedMulti = 100
  private val PruneFrom = 4
  private val PrunePerPass = 4
  private val MaxLen = 6

  private lazy val gate: Seq[(Long, Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_unigram_train")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  /** Train dictionary replayed from raw documents. */
  private lazy val wordFreq: Map[String, Long] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("source", "text").collect()
      .filter(_.getString(0) == "src0")
      .flatMap(_.getString(1).trim.toLowerCase.split("\\s+"))
      .filter(w => w.matches("^[a-z]+$") && w.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def costsOf(fr: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = fr.map(_._2).sum.toDouble
    fr.sortBy(_._1).map { case (p, f) =>
      (p, math.round(1e6 * math.log(total / f.toDouble)))
    }
  }

  /** Viterbi with the gate's exact tie law: packed = (dp+cost)·32 +
    * (MaxLen − l), min = (score ASC, longer piece wins ties).
    */
  private def viterbi(costs: Map[String, Long], word: String): (Seq[String], Long) = {
    val n = word.length
    val dp = Array.fill(n + 1)(Long.MaxValue / 64); dp(0) = 0L
    val bp = Array.fill(n + 1)(0)
    for (j <- 1 to n) {
      var best = Long.MaxValue
      for (l <- 1 to math.min(MaxLen, j)) {
        costs.get(word.substring(j - l, j)).foreach { c =>
          val packed = (dp(j - l) + c) * 32 + (MaxLen - l)
          if (packed < best) best = packed
        }
      }
      require(best != Long.MaxValue, s"unsegmentable $word at $j")
      dp(j) = best / 32
      bp(j) = MaxLen - (best % 32).toInt
    }
    var p = n
    var toks = List.empty[String]
    while (p > 0) { toks = word.substring(p - bp(p), p) :: toks; p -= bp(p) }
    (toks, dp(n))
  }

  /** The independent EM loop: per-pass (n_pieces, n_multi, n_tokens,
    * corpus_cost) plus each pass's cost table.
    */
  private lazy val replay: (Seq[(Long, Long, Long, Long, Long)], Seq[Map[String, Long]]) = {
    val multiSeed = wordFreq.toSeq
      .flatMap { case (w, f) =>
        for {
          l <- 2 to MaxLen
          s <- 0 to w.length - l
        } yield (w.substring(s, s + l), f)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(SeedMulti)
    val charSeed = wordFreq.toSeq
      .flatMap { case (w, f) => w.map(c => (c.toString, f)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val alphabet = charSeed.map(_._1).toSet

    var costs = costsOf(multiSeed ++ charSeed)
    val stats = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    val tables = Seq.newBuilder[Map[String, Long]]
    for (t <- 0 until Passes) {
      tables += costs.toMap
      val cm = costs.toMap
      val segs = wordFreq.toSeq.map { case (w, f) =>
        val (toks, c) = viterbi(cm, w); (f, toks, c)
      }
      stats += ((t.toLong, costs.size.toLong, costs.count(_._1.length > 1).toLong,
        segs.map { case (f, toks, _) => f * toks.size }.sum,
        segs.map { case (f, _, c) => f * c }.sum))
      if (t < Passes - 1) {
        val counts = segs.flatMap { case (f, toks, _) => toks.map(_ -> f) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val multiKept = costs.map(_._1).filter(_.length > 1)
          .flatMap(p => counts.get(p).filter(_ > 0).map(p -> _))
        val pruned =
          if (t + 1 >= PruneFrom)
            multiKept.sortBy { case (p, f) => (f, p) }.drop(PrunePerPass)
          else multiKept
        val chars = alphabet.toSeq.sorted
          .map(c => c -> math.max(counts.getOrElse(c, 0L), 1L))
        costs = costsOf(pruned ++ chars)
      }
    }
    (stats.result(), tables.result())
  }

  test("gate equals the independent EM replay bit-for-bit") {
    assert(gate == replay._1)
  }

  test("pure-EM passes are monotone non-increasing in corpus cost") {
    val cc = gate.map(_._5)
    for (t <- 1 until PruneFrom)
      assert(cc(t) <= cc(t - 1),
        s"pure-EM pass $t raised corpus cost ${cc(t - 1)} -> ${cc(t)}")
  }

  test("prune passes shrink the multi-piece inventory by at least the budget") {
    val nm = gate.map(_._3)
    for (t <- PruneFrom until Passes)
      assert(nm(t) <= nm(t - 1) - PrunePerPass,
        s"prune pass $t kept too much: ${nm(t - 1)} -> ${nm(t)}")
  }

  test("EM-encode serves from the persisted store and round-trips every word") {
    // first call may train+persist; the second must read the store
    graft.SparkEntry.queries("q_unigram_encode_em")(spark, d).collect()
    val before = BpeQueries.BpeVocabStore.trainRuns
    val rows = graft.SparkEntry.queries("q_unigram_encode_em")(spark, d).collect()
    assert(rows.nonEmpty)
    assert(BpeQueries.BpeVocabStore.trainRuns == before,
      "second EM-encode re-ran the EM loop")
    // round-trip identity: every non-UNK segmentation concatenates back
    val costs = UnigramQueries.emCostTable(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val segs = UnigramQueries.encodedWordsWith(spark, d, costs, Some(MaxLen))
      .collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      if (!r.getBoolean(2))
        assert(r.getSeq[String](1).mkString == r.getString(0),
          s"round-trip broke for ${r.getString(0)}")
    }
    // the persisted final table IS the replay's final pass
    assert(costs == replay._2.last.toSeq.sortBy(_._1))
  }

  test("every pass's segmentation is DP-optimal: cost <= the all-chars cost") {
    val (stats, tables) = replay
    for (t <- 0 until Passes) {
      val cm = tables(t)
      val allChars = wordFreq.toSeq
        .map { case (w, f) => f * w.map(c => cm(c.toString)).sum }.sum
      assert(stats(t)._5 <= allChars,
        s"pass $t corpus cost ${stats(t)._5} above the all-chars bound $allChars")
    }
  }
}
