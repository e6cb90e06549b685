package graft.cdc

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared filesystem + journal helpers for the store implementations —
  * one place for the recursive delete and the directory listing (which
  * must CLOSE the underlying stream: `Files.list` holds a directory fd
  * until closed, and a 60 s micro-batch cadence would leak one per batch).
  */
private[graft] object FsUtils {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** Eager, stream-closing directory listing. */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }
}

/** Append-only journal sink/source shared by every [[CdcDestination]]
  * (reference S5: keep every raw CDC event), layout `<root>/<table>_journal`.
  */
private[cdc] object Journals {
  def append(root: String, table: String, events: DataFrame): Unit =
    events.write.mode(SaveMode.Append)
      .parquet(Paths.get(root, s"${table}_journal").toString)

  def read(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(Paths.get(root, s"${table}_journal").toString)
}
