package graft.pipeline

import graft.SparkSpec

/** Laws of q_pipeline_incremental: the batch-arrival flow against persisted
  * state equals a FULL recompute over the union corpus (replayed here by an
  * independent in-memory Scala implementation of the arrival-order
  * semantics — the DuckDB oracle is the cross-engine version of the same
  * law); the serving plan touches the base only through the persisted
  * artifacts (no base-corpus scan); a second invocation trains nothing.
  */
class IncrementalPipelineSpec extends SparkSpec {

  private val d = sf("sf0.001")
  private val BatchMod = 23
  private val EvalMod = 89
  private val PackBudget = 128
  private val NGroups = 8

  private lazy val gate =
    IncrementalPipelineQueries.incrementalRun(spark, d)

  private lazy val gateRows = gate.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** Independent full-recompute replay: every stage of the pipeline over
    * the WHOLE corpus in plain Scala, arrival order (is_batch, doc_id).
    */
  private lazy val fullReplay: Seq[(Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .sortBy { case (id, _) => ((id % BatchMod == 0), id) } // arrival order
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shingles(t: String): Set[String] = {
      val w = toks(t)
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    final case class D(id: Long, isBatch: Boolean, nTok: Long, digest: String,
      quality: Boolean, sh: Set[String])
    val all = docs.map { case (id, t) =>
      val w = toks(t)
      val mean = if (w.isEmpty) None else Some(w.map(_.length).sum.toDouble / w.length)
      D(id, id % BatchMod == 0, w.length.toLong, md5hex(t),
        w.length >= 10 && mean.exists(_ <= 12.0), shingles(t))
    }
    // exact survivor: FIRST arrival per digest (all is pre-sorted)
    val seen = scala.collection.mutable.Set.empty[String]
    val exact = all.filter(dd => seen.add(dd.digest))
    val evalDigests = all.filter(dd => !dd.isBatch && dd.id % EvalMod == 0)
      .map(_.digest).toSet
    val elig = exact.filter(dd => dd.quality && !evalDigests.contains(dd.digest))
    def j(a: D, b: D): Double = {
      val i = a.sh.intersect(b.sh).size
      if (a.sh.isEmpty && b.sh.isEmpty) 0.0
      else i.toDouble / (a.sh.size + b.sh.size - i)
    }
    // greedy arrival-order near-dup: victim iff ANY earlier eligible pair
    val clean = elig.zipWithIndex.filterNot { case (dd, i) =>
      elig.take(i).exists(a => j(a, dd) >= 0.8)
    }.map(_._1)
    val baseTotal = clean.filterNot(_.isBatch).map(_.nTok).sum
    val budget = baseTotal + baseTotal / 10
    var cum = 0L
    val sel = clean.flatMap { dd =>
      cum += dd.nTok
      if (cum <= budget) Some(dd) else None
    }
    // greedy pack per grp in arrival order
    sel.groupBy(_.id % NGroups).toSeq.flatMap { case (grp, ds) =>
      var bin = 0L; var used = 0L; var first = true
      ds.map { dd => // ds preserves arrival order (groupBy on a sorted seq)
        if (!first && used + dd.nTok > PackBudget) { bin += 1; used = dd.nTok }
        else { used += dd.nTok; first = false }
        (dd.id, grp, bin, dd.nTok)
      }
    }.sortBy(_._1)
  }

  test("incremental batch flow == independent full recompute over the union corpus") {
    assert(gateRows.nonEmpty)
    assert(gateRows.toSeq == fullReplay,
      s"first diff: ${gateRows.toSeq.zipAll(fullReplay, null, null).find(p => p._1 != p._2)}")
  }

  test("the flow is non-trivial: batch docs enter, and some batch docs are filtered") {
    val batchIn = gateRows.count(_._1 % BatchMod == 0)
    assert(batchIn > 0, "no batch doc survived to the packed manifest")
    val batchAll = spark.read.parquet(s"$d/documents.parquet")
      .filter(s"doc_id % $BatchMod = 0").count()
    assert(batchIn < batchAll,
      "every batch doc survived — the gates never fired on this corpus")
  }

  test("serving plan reads persisted artifacts and never rescans the base corpus") {
    gate.collect() // settle AQE; artifacts exist after the first run
    val df = IncrementalPipelineQueries.incrementalRun(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bpe_vocab"), p.take(3000))
    assert(!p.contains("documents.parquet"),
      "serving plan scans the corpus table — base state must come from artifacts\n" + p.take(3000))
  }

  test("a second invocation trains zero artifacts (served, not rebuilt)") {
    gate.collect()
    val before = BpeQueries.BpeVocabStore.trainRuns
    IncrementalPipelineQueries.incrementalRun(spark, d).collect()
    assert(BpeQueries.BpeVocabStore.trainRuns == before,
      "second run rebuilt base-state artifacts")
  }
}
