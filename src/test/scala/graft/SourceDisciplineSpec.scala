package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level discipline guards for rules that type-checking cannot
  * enforce — each one is a regression class that actually shipped once.
  */
class SourceDisciplineSpec extends AnyFunSuite {

  private def mainSources: Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File("src/main/scala"))
  }

  test("no lazy localCheckpoint in main source (AQE races multi-consumer lazy checkpoints)") {
    // A lazy checkpoint shared by multiple plan subtrees lets AQE race the
    // branches into redundantly recomputing the whole upstream — measured
    // ~9× recomputation / 58-vs-537 process-CPU-s on q_distinct_hll, and
    // the same signature on q_source_overlap and q_pagerank (BASELINE.md
    // round-10 batch 3). Checkpoint EAGERLY, at the smallest reusable
    // frame, or not at all.
    val offenders = mainSources.filter { f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .contains("localCheckpoint(false)")
    }
    assert(offenders.isEmpty,
      s"lazy localCheckpoint(false) in: ${offenders.map(_.getPath).mkString(", ")}")
  }
}
