package graft.cdc

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Crash-safety of the flat→partitioned journal migration (Journals.
  * ensureLayout). The staging protocol's invariant under test: live
  * `_journal_date=` partition dirs are never deleted, at ANY crash point —
  * including the rolling-upgrade case where a flat file appears after
  * partitioned history already exists (the scenario where the previous
  * wipe-partitions-and-recopy recovery destroyed journal history).
  */
class JournalMigrationSpec extends SparkSpec {

  import spark.implicits._

  private def events(ids: Range, date: String): DataFrame =
    ids.map(i => (i.toLong, s"$date 10:00:00")).toDF("id", "commitTs")
      .selectExpr("id", "CAST(commitTs AS TIMESTAMP) AS commitTs")

  private def freshRoot(): (String, Path) = {
    val root = Files.createTempDirectory("journal-mig").toString
    (root, Paths.get(root, "t_journal"))
  }

  private def readIds(root: String): Seq[Long] =
    Journals.read(spark, root, "t").select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def flatParquet(base: Path): Seq[Path] =
    FsUtils.listDir(base).filter(p =>
      !Files.isDirectory(p) && p.getFileName.toString.endsWith(".parquet"))

  private def partitionDirs(base: Path): Set[String] =
    FsUtils.listDir(base).filter(Files.isDirectory(_))
      .map(_.getFileName.toString).filter(_.startsWith("_journal_date=")).toSet

  test("legacy flat journal migrates into partition dirs, losing nothing") {
    val (root, base) = freshRoot()
    events(0 until 10, "2025-01-10").write.parquet(base.toString) // legacy layout
    Journals.append(root, "t", events(10 until 15, "2025-01-11"))
    assert(readIds(root) == (0L until 15L))
    assert(flatParquet(base).isEmpty, "flat originals must be retired")
    assert(partitionDirs(base) ==
      Set("_journal_date=2025-01-10", "_journal_date=2025-01-11"))
    // no protocol residue
    assert(!Files.exists(base.resolve("_flat_migration_pending")))
    assert(!Files.exists(base.resolve("_flat_migration_staged")))
    assert(!Files.exists(base.resolve("_flat_migration_staging")))
  }

  test("crash-mid-copy recovery never wipes existing partitioned history") {
    val (root, base) = freshRoot()
    Journals.append(root, "t", events(0 until 10, "2025-01-10")) // live history
    // rolling-upgrade writer drops a flat file next to the partition dirs
    events(10 until 14, "2025-01-11").write.mode("append").parquet(base.toString)
    // simulate a crash mid-copy: pending marker written, staging half-built
    Files.write(base.resolve("_flat_migration_pending"),
      flatParquet(base).map(_.getFileName.toString).mkString("\n").getBytes("UTF-8"))
    val halfPart = base.resolve("_flat_migration_staging").resolve("_journal_date=2025-01-11")
    Files.createDirectories(halfPart)
    Files.write(halfPart.resolve("part-half.parquet"), Array[Byte](1, 2, 3))
    // recovery runs on the next read: redo the copy from the originals
    assert(readIds(root) == (0L until 14L))
    assert(partitionDirs(base).contains("_journal_date=2025-01-10"),
      "pre-existing history partition must survive recovery")
    assert(flatParquet(base).isEmpty)
    assert(!Files.exists(base.resolve("_flat_migration_staging")))
  }

  test("crash-mid-move recovery replays the manifest idempotently") {
    val (root, base) = freshRoot()
    Journals.append(root, "t", events(0 until 10, "2025-01-10"))
    events(10 until 14, "2025-01-11").write.mode("append").parquet(base.toString)
    // build the post-commit-point state by hand: staged copy + manifest,
    // with ONE staged file already moved (the crash happened mid-replay)
    val staging = base.resolve("_flat_migration_staging")
    events(10 until 14, "2025-01-11")
      .withColumn("_journal_date", org.apache.spark.sql.functions.to_date($"commitTs"))
      .repartition(2).write.partitionBy("_journal_date").parquet(staging.toString)
    val manifest = FsUtils.listDir(staging)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_journal_date="))
      .flatMap(d => FsUtils.listDir(d).filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => s"${d.getFileName}/${f.getFileName}"))
    assert(manifest.size >= 2, "need at least two staged files to crash between")
    Files.write(base.resolve("_flat_migration_pending"),
      flatParquet(base).map(_.getFileName.toString).mkString("\n").getBytes("UTF-8"))
    Files.write(base.resolve("_flat_migration_staged"),
      manifest.mkString("\n").getBytes("UTF-8"))
    val moved = staging.resolve(manifest.head)
    val dst = base.resolve(manifest.head)
    Files.createDirectories(dst.getParent)
    Files.move(moved, dst)
    // recovery: remaining staged files move once; nothing duplicates
    assert(readIds(root) == (0L until 14L), "each event exactly once after replay")
    assert(flatParquet(base).isEmpty)
    assert(!Files.exists(base.resolve("_flat_migration_pending")))
    assert(!Files.exists(base.resolve("_flat_migration_staged")))
    assert(!Files.exists(staging))
  }

  /** Stand-in for a second PROCESS: an exclusive lock on `_writer.lock`
    * through an independent FileChannel. From another process Journals'
    * `tryLock` returns null; from this JVM it throws
    * OverlappingFileLockException — Journals treats both as contention, so
    * the refusal path under test is the same one a real second process hits.
    */
  private def holdingForeignWriterLock[T](base: Path)(body: => T): T = {
    Files.createDirectories(base)
    val ch = java.nio.channels.FileChannel.open(base.resolve("_writer.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try { val l = ch.lock(); try body finally l.release() } finally ch.close()
  }

  test("a second writer process is refused: append fails fast under a foreign lock") {
    val (root, base) = freshRoot()
    Journals.append(root, "t", events(0 until 5, "2025-01-10"))
    holdingForeignWriterLock(base) {
      val e = intercept[IllegalStateException] {
        Journals.append(root, "t", events(5 until 10, "2025-01-11"))
      }
      assert(e.getMessage.contains("locked by another writer"))
    }
    assert(readIds(root) == (0L until 5L), "refused append must write nothing")
    // lock died with the "process": the journal is not wedged
    Journals.append(root, "t", events(5 until 10, "2025-01-11"))
    assert(readIds(root) == (0L until 10L))
  }

  test("foreign lock blocks migration but never steady-state reads") {
    val (root, base) = freshRoot()
    Journals.append(root, "t", events(0 until 5, "2025-01-10"))
    holdingForeignWriterLock(base) {
      // steady state: reading an already-partitioned journal takes no lock
      assert(readIds(root) == (0L until 5L))
    }
    // legacy flat file appears → the next read has migration work to do,
    // and must refuse to run it while another writer owns the journal
    events(5 until 8, "2025-01-11").write.mode("append").parquet(base.toString)
    holdingForeignWriterLock(base) {
      intercept[IllegalStateException] { readIds(root) }
    }
    // writer gone → migration proceeds and nothing was lost or duplicated
    assert(readIds(root) == (0L until 8L))
    assert(flatParquet(base).isEmpty)
  }
}
