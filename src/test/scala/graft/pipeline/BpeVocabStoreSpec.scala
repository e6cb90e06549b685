package graft.pipeline

import graft.SparkSpec

/** [[BpeQueries.BpeVocabStore]]'s persistence contracts (r14 verdict item
  * 5 + advice): the corpus fingerprint is a CONTENT digest — an in-place
  * regeneration with identical byte count inside one mtime tick still
  * invalidates the cache (the old (bytes, mtime) scheme's documented
  * staleness window) — and publication is atomic: a half-written store is
  * replaced, a complete concurrent copy wins.
  */
class BpeVocabStoreSpec extends SparkSpec {

  private def tmpDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  private def writeDocs(dir: java.io.File, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
  }

  private def partFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir, "documents.parquet"))
  }

  test("fingerprint is stable on an unchanged corpus") {
    val dir = tmpDir("bpe_fp_stable")
    writeDocs(dir, 0L until 100L)
    val fp1 = BpeQueries.BpeVocabStore.fingerprint(dir.getAbsolutePath)
    val fp2 = BpeQueries.BpeVocabStore.fingerprint(dir.getAbsolutePath)
    assert(fp1 == fp2)
  }

  test("same-size same-mtime in-place regeneration invalidates the key") {
    val dir = tmpDir("bpe_fp_regen")
    val pinnedMtime = 1700000000000L
    // generation 1: values 10..109
    writeDocs(dir, 10L until 110L)
    val size1 = partFiles(dir).map(_.length).sum
    partFiles(dir).foreach(_.setLastModified(pinnedMtime))
    val fp1 = BpeQueries.BpeVocabStore.fingerprint(dir.getAbsolutePath)
    // generation 2: values 11..110 — same row count, same fixed-width
    // encoding, same varint widths for the footer's min/max stats (10/11
    // and 109/110 encode at equal length), DIFFERENT content
    writeDocs(dir, 11L until 111L)
    val size2 = partFiles(dir).map(_.length).sum
    partFiles(dir).foreach(_.setLastModified(pinnedMtime))
    val fp2 = BpeQueries.BpeVocabStore.fingerprint(dir.getAbsolutePath)
    // the construction really does defeat the OLD (bytes, mtime) scheme:
    // identical total bytes, identical pinned mtime
    assert(size1 == size2,
      s"test construction drifted: sizes $size1 vs $size2 — pick values " +
        "with identical parquet encoding so the old scheme is truly blind")
    assert(fp1 != fp2,
      "content digest failed to distinguish same-size same-mtime corpora")
  }

  test("atomic publish: half-written store replaced, complete copy wins") {
    import spark.implicits._
    val root = tmpDir("bpe_atomic")
    val path = s"${root.getAbsolutePath}/store"
    val dfA = Seq(("a", 1L)).toDF("word", "freq")
    val dfB = Seq(("b", 2L)).toDF("word", "freq")
    BpeQueries.BpeVocabStore.writeAtomic(dfA, path)
    assert(new java.io.File(path, "_SUCCESS").isFile)
    // a COMPLETE existing copy wins over a newcomer (same-key publishes
    // are deterministic-identical in production; here they differ so the
    // winner is observable)
    BpeQueries.BpeVocabStore.writeAtomic(dfB, path)
    assert(spark.read.parquet(path).collect().map(_.getString(0)).toSeq == Seq("a"))
    // a half-written copy (no _SUCCESS — crashed JVM) is cleared and replaced
    assert(new java.io.File(path, "_SUCCESS").delete())
    BpeQueries.BpeVocabStore.writeAtomic(dfB, path)
    assert(new java.io.File(path, "_SUCCESS").isFile)
    assert(spark.read.parquet(path).collect().map(_.getString(0)).toSeq == Seq("b"))
    // no temp debris left behind
    assert(Option(root.listFiles()).toSeq.flatten.map(_.getName).forall(!_.contains("_tmp_")))
  }
}
