package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[PrefixRank]] must equal the single-partition global window it
  * replaces — for RANDOM data (duplicate keys, negative values, skewed
  * group sizes) and for EVERY partition count, because the whole point of
  * the two-level prefix is that the range cuts cannot change the answer.
  */
class PrefixRankSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Gen[List[(Long, Long, Long)]] =
    Gen.chooseNum(0, 60).flatMap { n =>
      Gen.listOfN(n, for {
        grp <- Gen.chooseNum(0L, 3L)
        key <- Gen.chooseNum(-5L, 5L) // heavy ties: the order needs the id tiebreak
        v <- Gen.chooseNum(-100L, 100L)
      } yield (grp, key, v))
    }

  private def withIds(data: List[(Long, Long, Long)]) =
    data.zipWithIndex.map { case ((g, k, v), id) => (g, k, v, id.toLong) }
      .toDF("grp", "key", "v", "id")

  test("withRunningTotal equals the global-window cumsum (property)") {
    val prop = Prop.forAll(rows, Gen.oneOf(1, 3, 7)) { (data, parts) =>
      val df = withIds(data)
      val naive = df.withColumn("cum",
        sum("v").over(Window.orderBy(col("key").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = PrefixRank.withRunningTotal(df,
          Seq(col("key").desc, col("id")), col("v"), "cum", parts)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("withGroupRank equals the per-group row_number (property)") {
    val prop = Prop.forAll(rows, Gen.oneOf(1, 3, 7)) { (data, parts) =>
      val df = withIds(data)
      val naive = df.withColumn("rk",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("key"), col("id"))).cast("long"))
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = PrefixRank.withGroupRank(df, Seq("grp"),
          Seq(col("key"), col("id")), "rk", parts)
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("input columns are preserved and row count is unchanged") {
    val df = withIds(List((0L, 1L, 2L), (1L, 1L, 3L), (0L, -1L, 4L)))
    val cum = PrefixRank.withRunningTotal(df, Seq(col("key"), col("id")),
      col("v"), "cum", 3)
    assert(cum.columns.toSet == Set("grp", "key", "v", "id", "cum"))
    assert(cum.count() == 3)
    val rk = PrefixRank.withGroupRank(df, Seq("grp"), Seq(col("key"), col("id")),
      "rk", 3)
    assert(rk.columns.toSet == Set("grp", "key", "v", "id", "rk"))
    assert(rk.count() == 3)
  }

  test("the ranged frame is materialized once; consumers never re-range it") {
    // the subtotal branch and the output branch join on the partition id,
    // so both must read ONE set of range cuts. The ranged+Pid frame is
    // checkpointed (Pid becomes literal data), so the consumer plan must
    // contain ZERO rangepartitioning exchanges — a re-ranging exchange in
    // either branch would mean independently-sampled cuts and silently
    // wrong offsets under shuffle-read reorder
    val df = (0 until 500).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try PrefixRank.withRunningTotal(df, Seq(col("id")), col("v"), "cum", 4)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert("rangepartitioning\\(".r.findAllIn(plan).isEmpty,
      s"consumer plan re-ranges the checkpointed frame:\n$plan")
    assert(plan.contains("_prefix_pid"), plan)
  }

  test("the only unpartitioned window in the plan is the subtotal frame") {
    // corpus-sized frames must never hit a global WindowExec: the plan's
    // unpartitioned window sorts the per-partition subtotal aggregate
    // (child contains the groupBy(_prefix_pid) HashAggregate), never the
    // input relation directly
    val df = (0 until 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    // AQE wraps the tree in query stages that hide WindowExec from
    // collect; the audit inspects the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try PrefixRank.withRunningTotal(df, Seq(col("id")), col("v"), "cum", 5)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.size == 1, s"expected exactly one global window:\n$plan")
    // its subtree aggregates to one row per range partition before sorting
    val subtree = global.head.child.toString
    assert(subtree.contains("_prefix_pid"), s"global window not over subtotals:\n$subtree")
    assert(subtree.contains("HashAggregate") || subtree.contains("SortAggregate"),
      s"global window input is not the subtotal aggregate:\n$subtree")
  }
}
