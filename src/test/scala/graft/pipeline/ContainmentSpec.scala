package graft.pipeline

import graft.SparkSpec

/** Laws of q_dedup_containment: every planted composite's source docs are
  * flagged as contained in it at near-1 containment while their Jaccard
  * to the composite stays below the dup threshold (the asymmetry the face
  * exists for), the metric arithmetic replays independently from shingle
  * sets built in plain Scala, and containment is always ≥ jaccard.
  */
class ContainmentSpec extends SparkSpec {

  private val d = sf("sf0.01")
  // mirrors the face's corpus-derived offset: next multiple of 1000 above
  // the organic max doc_id (collision-proof at any corpus size)
  private lazy val CompBase = (texts.keys.max / 1000 + 1) * 1000

  private lazy val gate =
    graft.SparkEntry.queries("q_dedup_containment")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))

  private lazy val texts: Map[Long, String] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap

  private def shingles(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (t.length < 3) Set.empty
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  private lazy val allDocs: Map[Long, Set[String]] = {
    val composites = texts.keys.filter(id => id % 83 == 0 && texts.contains(id + 1))
      .map(id => (id + CompBase) -> shingles(texts(id) + " " + texts(id + 1)))
    texts.map { case (id, t) => id -> shingles(t) } ++ composites
  }

  test("planted sources are contained in their composites at near-1 containment, low jaccard") {
    val plantedSources = texts.keys
      .filter(id => id % 83 == 0 && texts.contains(id + 1)).toSeq.sorted
    assert(plantedSources.nonEmpty)
    val byPair = gate.map(r => (r._1, r._2) -> r).toMap
    plantedSources.foreach { src =>
      val comp = src + CompBase
      // the source's shingle set sits inside the composite's, so the
      // directional row (src → composite) must be flagged
      val row = byPair.get((src, comp))
      assert(row.isDefined, s"source $src not flagged inside composite $comp")
      assert(row.get._6 >= 0.9, s"containment ${row.get._6}")
      // and the asymmetry: composite is ~2 docs, so jaccard ≈ |A|/|B| < 0.8
      assert(row.get._7 < 0.8, s"jaccard ${row.get._7} — composite lost its asymmetry")
    }
  }

  test("every emitted row's counts and metrics replay from independent shingle sets") {
    gate.foreach { case (cid, bid, nc, nb, ni, cont, jac) =>
      val (a, b) = (allDocs(cid), allDocs(bid))
      assert(nc == a.size && nb == b.size)
      assert(ni == a.intersect(b).size)
      assert(cont == ni.toDouble / nc)
      assert(jac == ni.toDouble / (nc + nb - ni))
      assert(cont >= jac)
      assert(cont >= 0.9)
    }
  }
}
