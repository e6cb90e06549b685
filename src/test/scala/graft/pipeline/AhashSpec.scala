package graft.pipeline

import graft.SparkSpec

/** Laws of q_multimodal_ahash at sf0.01: the 64-bit average hash is
  * replayed independently in plain Scala from the raw TEXT (pixels,
  * thumbnail index arithmetic, integer mean, bit packing — no codec
  * shared), exact-duplicate texts collide at Hamming 0, and the banded
  * candidate generation honors the pigeonhole guarantee (every true pair
  * at Hamming ≤ 3 MUST appear; the gate's output is a subset of the true
  * ≤6 pair set).
  */
class AhashSpec extends SparkSpec {

  private val d = sf("sf0.01")

  private lazy val gate =
    graft.SparkEntry.queries("q_multimodal_ahash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private lazy val texts: Map[Long, String] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap

  /** The full perceptual pipeline replayed without the codec: 16×16
    * pixels from cycled UTF-8 bytes, 8×8 nearest thumbnail, integer-mean
    * bit packing into (lo, hi).
    */
  private def hashOf(text: String): (Long, Long) = {
    val tb = text.getBytes("UTF-8")
    val px = Array.tabulate(256)(i =>
      if (tb.isEmpty) (i & 0xFF) else tb(i % tb.length) & 0xFF)
    val thumb = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      px((y * 16 / 8) * 16 + (x * 16 / 8))
    }
    val m = thumb.map(_.toLong).sum / 64
    var lo = 0L; var hi = 0L
    for (i <- 0 until 32) if (thumb(i) > m) lo |= (1L << i)
    for (i <- 32 until 64) if (thumb(i) > m) hi |= (1L << (i - 32))
    (lo, hi)
  }

  private lazy val hashes: Map[Long, (Long, Long)] =
    texts.map { case (id, t) => id -> hashOf(t) }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  /** Exact all-pairs Hamming ≤ 6 (the banded gate approximates this). */
  private lazy val exact: Map[(Long, Long), Int] = {
    val ids = hashes.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      h = ham(hashes(ids(i)), hashes(ids(j))) if h <= 6
    } yield (ids(i), ids(j)) -> h).toMap
  }

  test("every emitted pair's Hamming distance matches the codec-free Scala replay") {
    gate.foreach { case (a, b, h) =>
      assert(exact.get((a, b)).contains(h.toInt),
        s"pair ($a,$b) emitted $h, replay ${exact.get((a, b))}")
    }
  }

  test("perceptually identical images (Hamming 0) exist in this corpus and are all caught") {
    // raw-byte-identical texts don't exist at sf0.01 (the text dedup
    // groups are normalized-equal, not byte-equal) — but near-identical
    // texts still collapse to identical thumbnails; those are the
    // hash-collision pairs this face exists to catch
    val zero = exact.collect { case (p, 0) => p }.toSet
    assert(zero.nonEmpty, "corpus lost its perceptual-duplicate pairs")
    val emitted = gate.map(r => (r._1, r._2)).toSet
    zero.foreach { p =>
      assert(emitted.contains(p), s"Hamming-0 pair $p not flagged")
      assert(gate.find(r => (r._1, r._2) == p).get._3 == 0L)
    }
  }

  test("pigeonhole: every true pair at Hamming <= 3 is caught; output is a subset of the true <=6 set") {
    val emitted = gate.map(r => (r._1, r._2)).toSet
    exact.foreach { case (p, h) =>
      if (h <= 3) assert(emitted.contains(p),
        s"pair $p at Hamming $h must share a 16-bit band and be caught")
    }
    assert(emitted.subsetOf(exact.keySet))
  }
}
