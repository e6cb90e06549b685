package graft.analytics

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for scan
  * pruning. At 100 TB the dominant cost is files READ, not rows computed —
  * a layout whose per-file min/max zone maps bound EVERY query dimension
  * lets the scanner skip most of the table for selective predicates
  * (the technique behind Delta/Iceberg `ZORDER BY` and the classic
  * Morton-order UB-tree literature, Bayer 1997).
  *
  * The driver-gated query below computes the 20-bit Morton interleave of
  * two 10-bit dimensions (customer bucket × order-day bucket) with the
  * standard magic-number bit-spread (no loops, 4 codegen'd integer steps),
  * assigns each row to one of 16 equi-width z-range "files", and emits the
  * per-file zone map (min/max of BOTH dims) plus the file-skip decision for
  * one probe range per dimension. The same stats for a 1-D "linear" layout
  * (bucket by customer only) sit alongside: z-order files bound both dims
  * to quarter-range tiles (probe hits 4/16 files on either dim), where the
  * linear layout prunes its sort dim but must read 16/16 files for any
  * date-only predicate. Everything is integer-exact.
  *
  * Scale: the zkey is a map-only expression chain (whole-stage codegen,
  * no shuffle); the zone-map rollup reduces to n_files rows via map-side
  * combine. In a real write path the SAME key feeds
  * `repartitionByRange(n_files, $"zkey")` + `sortWithinPartitions` so each
  * written file covers one contiguous z-range — the bucket arithmetic here
  * is the deterministic stand-in for those sampled range boundaries, so the
  * oracle can rebuild the assignment exactly.
  */
object LayoutQueries {

  /** Interleave-ready bit spread: 10-bit value → even bit positions of a
    * 20-bit word (B(x) in the Morton literature; magic masks are the
    * 16-bit spread constants, valid for any input < 2^16).
    */
  private def spreadSteps(src: String, a: String, b: String, c: String, d: String): Seq[(String, String)] =
    Seq(
      a -> s"($src | shiftleft($src, 8)) & 16711935",
      b -> s"($a | shiftleft($a, 4)) & 252645135",
      c -> s"($b | shiftleft($b, 2)) & 858993459",
      d -> s"($c | shiftleft($c, 1)) & 1431655765")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_zorder_layout",
      """WITH base AS (
        |  SELECT o_orderkey,
        |         o_custkey % 1024 AS x,
        |         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) % 1024 AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, x, y,
        |         (x | (x << 8)) & 16711935 AS xa, (y | (y << 8)) & 16711935 AS ya FROM base),
        |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb, (ya | (ya << 4)) & 252645135 AS yb FROM s1),
        |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc, (yb | (yb << 2)) & 858993459 AS yc FROM s2),
        |s4 AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd, (yc | (yc << 1)) & 1431655765 AS yd FROM s3),
        |z AS (SELECT o_orderkey, x, y, xd | (yd << 1) AS zkey FROM s4),
        |layouts AS (
        |  SELECT 'zorder' AS layout, zkey // 65536 AS bucket, x, y FROM z
        |  UNION ALL
        |  SELECT 'linear' AS layout, x // 64 AS bucket, x, y FROM z)
        |SELECT layout, bucket, COUNT(*) AS n,
        |       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max,
        |       CASE WHEN MAX(x) >= 100 AND MIN(x) <= 150 THEN 1 ELSE 0 END AS probe_x_hit,
        |       CASE WHEN MAX(y) >= 200 AND MIN(y) <= 250 THEN 1 ELSE 0 END AS probe_y_hit
        |FROM layouts GROUP BY 1, 2
        |ORDER BY layout, bucket""".stripMargin) { (s, d) =>
      var z = Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("o_custkey % 1024").as("x"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 1024").as("y"))
      for ((name, e) <- spreadSteps("x", "xa", "xb", "xc", "xd") ++
             spreadSteps("y", "ya", "yb", "yc", "yd"))
        z = z.withColumn(name, expr(e))
      val zkey = z.select(col("x"), col("y"), expr("xd | shiftleft(yd, 1)").as("zkey"))
      val layouts = zkey
        .select(lit("zorder").as("layout"), expr("zkey DIV 65536").as("bucket"), col("x"), col("y"))
        .unionByName(zkey
          .select(lit("linear").as("layout"), expr("x DIV 64").as("bucket"), col("x"), col("y")))
      layouts.groupBy("layout", "bucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .withColumn("probe_x_hit", expr("IF(x_max >= 100 AND x_min <= 150, 1, 0)"))
        .withColumn("probe_y_hit", expr("IF(y_max >= 200 AND y_min <= 250, 1, 0)"))
        .orderBy("layout", "bucket")
    },

    // ----- co-located bucketed join (shuffle-free fact-to-fact join) ----
    // The 100 TB join story the brief names outright: two fact tables
    // bucketed on their join key with the SAME bucket count join WITHOUT
    // shuffling either side — the scan itself delivers the partitioning,
    // so the biggest exchange of the warehouse's hottest join (orders ⋈
    // lineitem) disappears from every downstream run. Setup materializes
    // both tables ONCE per (session, sf) via `bucketBy(8, key)` +
    // `sortBy` `saveAsTable` (Spark's persistent-bucket metadata is what
    // the planner trusts); the query then joins the BUCKETED tables and
    // rolls up — PlanAuditSpec asserts the executed plan has NO exchange
    // on the join key (only the rollup's), and the oracle computes the
    // identical aggregate from the RAW parquet, proving the layout
    // changed the plan, not the result. This is the managed-table
    // counterpart of cdc.BucketedTableStore's directory buckets (which
    // bound WRITE amplification; these bound JOIN shuffles).
    QueryDef(
      "q_bucketed_join",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val key = d.replaceAll("[^A-Za-z0-9]", "_")
      val wh = new java.io.File(s"target/bucketed_tables/$key").getAbsolutePath
      def ensure(name: String, df: org.apache.spark.sql.DataFrame, bucketCol: String): String = {
        val table = s"graft_bkt_${name}_$key"
        // the PARQUET PATH is the source of truth, not the catalog entry: a
        // persistent metastore can hold a dangling registration after `sbt
        // clean` wipes target/, and an in-memory catalog forgets a perfectly
        // good materialization between sessions. Re-write only when the
        // parquet is absent; (re-)register whenever the table is missing.
        val haveParquet = new java.io.File(s"$wh/$name/_SUCCESS").exists()
        if (!haveParquet) {
          if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE $table")
          df.write.format("parquet")
            .bucketBy(8, bucketCol).sortBy(bucketCol)
            .option("path", s"$wh/$name")
            .mode("overwrite")
            .saveAsTable(table)
        } else if (!s.catalog.tableExists(table)) {
          // cheap re-register over existing buckets — DDL only, no data move
          val ddlSchema = df.schema.toDDL
          s.sql(s"""CREATE TABLE $table ($ddlSchema) USING parquet
                   |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO 8 BUCKETS
                   |LOCATION '$wh/$name'""".stripMargin)
        }
        table
      }
      val ordT = ensure("orders", Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority"), "o_orderkey")
      val liT = ensure("lineitem", Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice"), "l_orderkey")
      s.table(ordT)
        .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
        .orderBy("o_orderpriority")
    },

    // ----- Bloom-filter file-skipping index (point-predicate pruning) ----
    // The complement of q_zorder_layout's zone maps: min/max ranges prune
    // RANGE predicates on the layout's sort dimensions, but a point lookup
    // on a column the layout scatters (here: customer key in an
    // orderkey-laid-out table) hits every file's [min,max]. A per-file
    // Bloom filter over that column (the technique behind Delta/Parquet
    // column Bloom indexes) answers "might file f contain v?" from index
    // metadata alone — no false negatives ever, false positives at the
    // fill-factor rate, so a point lookup reads the handful of files the
    // index admits and the exact predicate re-verifies inside them.
    //
    // Everything is cross-engine exact: rows land in 32 "files" by
    // o_orderkey % 32, each file's filter is the DISTINCT set of 16-bit
    // positions from k=2 md5-derived hashes per value (the md5Hi64 hex
    // chain — DuckDB rebuilds identical positions from substr(md5(..)));
    // the gate hash-matches the full per-(file, probe) decision table:
    // bloom verdict AND ground truth, for present keys and an absent one.
    // LayoutSkipSpec asserts the no-false-negative invariant on top.
    //
    // Scale: the index is ONE distinct-aggregate over the scan (map-side
    // combined; ≤ 2·distinct values per file, capped at 2¹⁶ positions);
    // probes are a broadcast few-row join against the index — the data
    // files are never touched to answer "which files". In a real write
    // path the positions fold into m/64 BIGINT words via bit_or (exactly
    // functions.BloomFilters.build) and live in the table's commit
    // metadata, read by the planner before any scan is scheduled.
    QueryDef(
      "q_bloom_fileskip",
      """WITH base AS (
        |  SELECT CAST(o_orderkey % 32 AS BIGINT) AS file,
        |         CAST(o_custkey AS BIGINT) AS cust
        |  FROM orders),
        |bits AS (
        |  SELECT DISTINCT file, pos FROM (
        |    SELECT file, CAST(('0x' || substr(md5('b0:' || CAST(cust AS VARCHAR)), 1, 4)) AS BIGINT) AS pos FROM base
        |    UNION ALL
        |    SELECT file, CAST(('0x' || substr(md5('b1:' || CAST(cust AS VARCHAR)), 1, 4)) AS BIGINT) FROM base) t),
        |file_stats AS (SELECT file, COUNT(*) AS n_rows FROM base GROUP BY 1),
        |bits_set AS (SELECT file, COUNT(*) AS bits_set FROM bits GROUP BY 1),
        |probes AS (SELECT CAST(UNNEST([7, 421, 1399, 999999999]) AS BIGINT) AS probe_cust),
        |seeds AS (SELECT UNNEST([0, 1]) AS seed),
        |probe_pos AS (
        |  SELECT probe_cust, seed,
        |         CAST(('0x' || substr(md5('b' || CAST(seed AS VARCHAR) || ':' || CAST(probe_cust AS VARCHAR)), 1, 4)) AS BIGINT) AS pos
        |  FROM probes CROSS JOIN seeds),
        |matched AS (
        |  SELECT file, probe_cust, COUNT(DISTINCT seed) AS n_seed_hits
        |  FROM bits JOIN probe_pos USING (pos)
        |  GROUP BY 1, 2),
        |truth AS (SELECT DISTINCT file, probe_cust
        |          FROM base JOIN probes ON cust = probe_cust)
        |SELECT f.file, p.probe_cust, f.n_rows, b.bits_set,
        |       COALESCE(m.n_seed_hits, 0) = 2 AS bloom_maybe,
        |       t.probe_cust IS NOT NULL AS truly_contains
        |FROM file_stats f JOIN bits_set b USING (file)
        |CROSS JOIN probes p
        |LEFT JOIN matched m ON m.file = f.file AND m.probe_cust = p.probe_cust
        |LEFT JOIN truth t ON t.file = f.file AND t.probe_cust = p.probe_cust
        |ORDER BY f.file, p.probe_cust""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graft.SketchExpressions
      val base = Tables.orders(s, d).select(
        (col("o_orderkey") % 32).cast("long").as("file"),
        col("o_custkey").cast("long").as("cust"))
      // 16-bit position = top 16 digest bits, the proven md5 hex-chain
      // parity (DuckDB reads the same bits as the first 4 hex digits)
      def bpos(seed: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        shiftrightunsigned(SketchExpressions.md5Hi64(
          concat(lit("b"), seed.cast("string"), lit(":"), v.cast("string"))), 48)
      val bits = base.select(col("file"),
          explode(array(bpos(lit(0), col("cust")), bpos(lit(1), col("cust")))).as("pos"))
        .distinct()
      val fileStats = base.groupBy("file").agg(count(lit(1)).as("n_rows"))
      val bitsSet = bits.groupBy("file").agg(count(lit(1)).as("bits_set"))
      val probes = s.range(1)
        .select(explode(typedLit(Seq(7L, 421L, 1399L, 999999999L))).as("probe_cust"))
      val probePos = probes
        .crossJoin(s.range(1).select(explode(typedLit(Seq(0, 1))).as("seed")))
        .select(col("probe_cust"), col("seed"),
          bpos(col("seed"), col("probe_cust")).as("pos"))
      val matched = bits.join(broadcast(probePos), Seq("pos"))
        .select("file", "probe_cust", "seed").distinct()
        .groupBy("file", "probe_cust").agg(count(lit(1)).as("n_seed_hits"))
      val truth = base.join(broadcast(probes), col("cust") === col("probe_cust"))
        .select("file", "probe_cust").distinct()
        .withColumn("truly_contains", lit(true))
      fileStats.join(bitsSet, "file")
        .crossJoin(broadcast(probes))
        .join(matched, Seq("file", "probe_cust"), "left")
        .join(truth, Seq("file", "probe_cust"), "left")
        .select(col("file"), col("probe_cust"), col("n_rows"), col("bits_set"),
          (coalesce(col("n_seed_hits"), lit(0L)) === 2).as("bloom_maybe"),
          coalesce(col("truly_contains"), lit(false)).as("truly_contains"))
        .orderBy("file", "probe_cust")
    }
  )
}
