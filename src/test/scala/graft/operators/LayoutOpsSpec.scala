package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned writes prune partitions for date filters") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val events = graft.analytics.Tables.events(spark, sf())
    LayoutOps.writePartitionedByDate(events, "ts", dir)

    val filtered = LayoutOps.readPartitioned(spark, dir)
      .filter($"p_date" === "2024-01-05")
    val plan = filtered.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    // pruning must reach the file index: only one partition directory read
    val scanned = filtered.select(countDistinct($"p_date")).collect()(0).getLong(0)
    assert(scanned == 1)
    // and the data round-trips
    val expected = events.filter($"ts".cast("date") === "2024-01-05").count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("sorted-within-partition writes produce selective row-group stats") {
    val dir = Files.createTempDirectory("graft-sorted").toString
    val orders = graft.analytics.Tables.orders(spark, sf())
    LayoutOps.writeSortedWithinPartitions(orders, Seq("o_orderdate"), dir, numFiles = 2)
    val back = LayoutOps.readPartitioned(spark, dir)
    assert(back.count() == orders.count())
    // range predicate still pushes into the scan of the rewritten layout
    val plan = back.filter($"o_orderdate" >= "2000-01-01").queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), plan)
  }

  test("targetFileCount sizes up with data volume") {
    val small = graft.analytics.Tables.region(spark, sf())
    val big = graft.analytics.Tables.lineitem(spark, sf())
    val nSmall = LayoutOps.targetFileCount(small, 1L << 20)
    val nBig = LayoutOps.targetFileCount(big, 1L << 20)
    assert(nSmall == 1)
    assert(nBig >= nSmall)
  }
}
