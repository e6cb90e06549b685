package graft.analytics

import graft.SparkSpec

/** Laws of q_ldiversity: the violator set equals an independent Scala
  * replay over the raw customer rows, every violator is genuinely
  * homogeneity-risky (< 3 distinct segments), and no l-diverse class
  * leaks into the output.
  */
class LDiversitySpec extends SparkSpec {

  private val d = sf("sf0.01")

  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  private lazy val gate =
    graft.SparkEntry.queries("q_ldiversity")(spark, d)
      .collect().map(r => (num(r, 0), num(r, 1), num(r, 2),
        num(r, 3), num(r, 4), num(r, 5)))

  private lazy val replay: Seq[(Long, Long, Long, Long, Long, Long)] = {
    val rows = spark.read.parquet(s"$d/customer.parquet")
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => (num(r, 0),
        math.floor(r.getAs[Number](1).doubleValue() / 5000).toLong,
        r.getString(2)))
    rows.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((nat, band), xs) =>
      val perSeg = xs.groupBy(_._3).map(_._2.size.toLong).toSeq
      val size = perSeg.sum
      val nSeg = perSeg.size.toLong
      val top = perSeg.max
      if (nSeg < 3) Some((nat, band, size, nSeg, top, top * 1000 / size))
      else None
    }.sortBy(t => (t._1, t._2))
  }

  test("violator classes equal the independent replay") {
    assert(gate.toSeq == replay)
  }

  test("every violator is homogeneity-risky and arithmetic is consistent") {
    gate.foreach { case (_, _, size, nSeg, top, permille) =>
      assert(nSeg < 3 && nSeg >= 1)
      assert(top <= size)
      assert(permille == top * 1000 / size)
      if (nSeg == 1) assert(permille == 1000)
    }
  }
}
