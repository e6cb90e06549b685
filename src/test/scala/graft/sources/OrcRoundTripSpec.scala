package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Law of the ORC ingestion face: the staged ORC holds EXACTLY the source
  * parquet's rows — every staged column value survives the
  * parquet→ORC→scan round-trip bit-for-bit (the gate's aggregate-level
  * hash match, strengthened here to row level on the spec corpus).
  */
class OrcRoundTripSpec extends SparkSpec {

  private val d = sf("sf0.001")
  private val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag",
    "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")

  test("staged ORC equals the source parquet row-for-row on the staged columns") {
    val dir = FormatSources.lineitemOrc(spark, d)
    val orc = spark.read.orc(dir)
      .orderBy("l_orderkey", "l_linenumber").collect()
    val pq = graft.analytics.Tables.lineitem(spark, d)
      .select(cols.map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(orc.length == pq.length)
    orc.zip(pq).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"row drift: $a vs $b")
    }
  }
}
