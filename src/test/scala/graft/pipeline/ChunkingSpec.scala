package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("stride chunks: full coverage, fixed overlap, exact tails") {
    val df = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = ChunkingQueries.strideChunks(df, window = 32, stride = 24)
      .orderBy("chunk_id").collect()
    // starts 0, 24, 48 → windows of 32, 26, 2 tokens
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(32L, 26L, 2L))
    // overlap: consecutive windows share window-stride = 8 tokens — verified
    // via digests of the explicit slices
    val toks = (1 to 50).map(i => s"t$i")
    def d(s: Int, n: Int) = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.slice(s, s + n).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.map(_.getString(3)).toSeq == Seq(d(0, 32), d(24, 32), d(48, 32)))
  }

  test("packing: bins respect the budget, order is preserved, oversized docs sit alone") {
    // one group (nGroups=1): nts 30,30,30,100,10,60,5 with budget 64
    val docs = Seq(30, 30, 30, 100, 10, 60, 5).zipWithIndex.map { case (nt, i) =>
      (i.toLong, (1 to nt).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = ChunkingQueries.packSequences(docs, budget = 64, nGroups = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // greedy fold: [30,30] fills bin0 (60); 30 opens bin1; 100 exceeds the
    // budget outright → bin2 alone, untruncated; 10 opens bin3; 60 opens
    // bin4 (10+60 > 64); 5 opens bin5 (60+5 > 64)
    assert(out.toSeq == Seq((0L, 0L, 30L), (1L, 0L, 30L), (2L, 1L, 30L),
      (3L, 2L, 100L), (4L, 3L, 10L), (5L, 4L, 60L), (6L, 5L, 5L)))
    // invariant: every bin with >1 doc fits the budget
    val byBin = out.groupBy(_._2).values
    assert(byBin.forall(ds => ds.length == 1 || ds.map(_._3).sum <= 64))
  }

  test("packing invariants hold for random token-length sequences") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genNts = Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 100)))
    val prop = Prop.forAllNoShrink(genNts) { nts =>
      val docs = nts.zipWithIndex.map { case (nt, i) =>
        (i.toLong, (1 to nt).map(j => s"w$j").mkString(" "))
      }.toDF("doc_id", "text")
      val out = ChunkingQueries.packSequences(docs, budget = 64, nGroups = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byGrp = out.groupBy(_._2).values
      out.length == nts.length && // every doc exactly once
        byGrp.forall { ds =>
          val ordered = ds.sortBy(_._1)
          val bins = ordered.map(_._3)
          // bins start at 0, advance by at most 1, never retreat
          bins.head == 0 && bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 } &&
            // every multi-doc bin fits the budget...
            ordered.groupBy(_._3).values.forall(b => b.length == 1 || b.map(_._4).sum <= 64) &&
            // ...and every bin break is FORCED (greedy: the opener would
            // have overflowed the previous bin)
            ordered.zip(ordered.tail).forall { case (prev, cur) =>
              cur._3 == prev._3 ||
                ordered.filter(_._3 == prev._3).map(_._4).sum + cur._4 > 64
            }
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("packing streams groups independently and deterministically") {
    val docs = (0L until 100L).map(i => (i, (1 to (10 + (i % 7)).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = ChunkingQueries.packSequences(docs, 64, 8).orderBy("doc_id").collect().toSeq
    val b = ChunkingQueries.packSequences(docs.repartition(13), 64, 8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "packing must not depend on input partitioning")
  }
}
