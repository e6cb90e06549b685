package graft.analytics

import graft.QueryDef
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{SketchExpressions, StringDistanceFunctions}

/** Data-profiling / governance operators over the warehouse tables: the
  * audits a CDC-replicated analytics store runs before anyone trusts it —
  * privacy risk (k-anonymity, Sweeney 2002), snapshot drift, column
  * statistics (correlation sufficient stats, discrete quantiles, equi-depth
  * histograms, Benford digit profiles), weighted sampling (priority
  * sampling, Duffield, Lund & Thorup 2007) and typo-class string distance
  * (unrestricted Damerau-Levenshtein, Lowrance & Wagner 1975, as a native
  * codegen'd expression).
  *
  * Repo-wide boundary discipline applies: every cross-engine-compared
  * number is an integer (cents / epoch seconds / counts / scaled
  * percentages); the only doubles are intermediate sort keys built from a
  * single IEEE division of exactly-representable integers, which both
  * engines round identically, and they never appear in the output.
  */
object ProfileQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----- k-anonymity audit (Sweeney 2002) -----
    // Equivalence classes over the quasi-identifier tuple (nation, market
    // segment, coarse account-balance band); classes smaller than k = 5 are
    // the re-identification risk a release gate would suppress or
    // generalize. One map-side-combined aggregate — scales like any
    // group-count regardless of table size; the class count is bounded by
    // the quasi-identifier domain, not the row count.
    QueryDef(
      "q_kanonymity",
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(FLOOR(c_acctbal/5000) AS BIGINT) AS bal_band,
        |       COUNT(*) AS class_size
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
        |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 5000).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .filter(col("class_size") < 5)
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    },

    // ----- l-diversity audit (Machanavajjhala et al. 2007) -----
    // k-anonymity's blind spot: a class can be large (k-safe) yet have
    // every member share one SENSITIVE value — membership alone then
    // discloses it (the homogeneity attack). Equivalence classes here are
    // the quasi-identifier pair (nation, coarse balance band); the
    // sensitive attribute is the market segment. A class fails distinct
    // l-diversity (l = 3) when it holds fewer than 3 distinct segments;
    // the top-value share (×1000) quantifies how close it sits to
    // homogeneous. Two stacked map-side-combined aggregates — per-(class,
    // value) then per-class — so the shape is domain-bounded regardless
    // of row count, like q_kanonymity.
    QueryDef(
      "q_ldiversity",
      """WITH cv AS (SELECT c_nationkey,
        |                   CAST(FLOOR(c_acctbal/5000) AS BIGINT) AS bal_band,
        |                   c_mktsegment, COUNT(*) AS n
        |            FROM customer GROUP BY 1, 2, 3),
        |cls AS (SELECT c_nationkey, bal_band,
        |               CAST(SUM(n) AS BIGINT) AS class_size,
        |               CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive,
        |               CAST(MAX(n) AS BIGINT) AS top_cnt
        |        FROM cv GROUP BY 1, 2)
        |SELECT c_nationkey, bal_band, class_size, n_distinct_sensitive,
        |       top_cnt, top_cnt * 1000 // class_size AS top_permille
        |FROM cls WHERE n_distinct_sensitive < 3
        |ORDER BY c_nationkey, bal_band""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 5000).cast("long").as("bal_band"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .groupBy("c_nationkey", "bal_band")
        .agg(sum("n").as("class_size"),
          count(lit(1)).as("n_distinct_sensitive"),
          max("n").as("top_cnt"))
        .filter(col("n_distinct_sensitive") < 3)
        .select(col("c_nationkey"), col("bal_band"), col("class_size"),
          col("n_distinct_sensitive"), col("top_cnt"),
          expr("top_cnt * 1000 DIV class_size").as("top_permille"))
        .orderBy("c_nationkey", "bal_band")
    },

    // ----- snapshot diff (state drift between two as-of frontiers) -----
    // The versioned-store audit: reduce the event feed to latest-state-per-
    // key at two frontiers, then FULL OUTER join on the key and keep only
    // added / removed / changed rows. Both reductions window on the SAME
    // (user_id) partitioning the join shuffles on, so the whole diff is one
    // exchange family; at 100 TB the two snapshots would be bucketed CoW
    // tables (graft.cdc.BucketedTableStore) and the join co-located.
    QueryDef(
      "q_snapshot_diff",
      """WITH old AS (
        |  SELECT user_id, event_type AS state, CAST(ROUND(value*100) AS BIGINT) AS value_cents,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |new AS (
        |  SELECT user_id, event_type AS state, CAST(ROUND(value*100) AS BIGINT) AS value_cents,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |o AS (SELECT * FROM old WHERE rn = 1), n AS (SELECT * FROM new WHERE rn = 1)
        |SELECT COALESCE(o.user_id, n.user_id) AS user_id,
        |       o.state AS old_state, n.state AS new_state,
        |       o.value_cents AS old_value_cents, n.value_cents AS new_value_cents,
        |       CASE WHEN o.user_id IS NULL THEN 'added'
        |            WHEN n.user_id IS NULL THEN 'removed'
        |            ELSE 'changed' END AS change
        |FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
        |WHERE o.user_id IS NULL OR n.user_id IS NULL
        |   OR o.state <> n.state OR o.value_cents <> n.value_cents
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      def snap(upper: Option[String]) = {
        val base = Tables.events(s, d)
        upper.fold(base)(u => base.filter(col("ts") < lit(u).cast("timestamp")))
          .select(col("user_id"), col("event_type").as("state"),
            round(col("value") * 100).cast("long").as("value_cents"),
            col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("user_id", "state", "value_cents")
      }
      val o = snap(Some("2024-01-15")).as("o")
      val n = snap(None).as("n")
      o.join(n, col("o.user_id") === col("n.user_id"), "full_outer")
        .filter(col("o.user_id").isNull || col("n.user_id").isNull ||
          col("o.state") =!= col("n.state") ||
          col("o.value_cents") =!= col("n.value_cents"))
        .select(
          coalesce(col("o.user_id"), col("n.user_id")).as("user_id"),
          col("o.state").as("old_state"), col("n.state").as("new_state"),
          col("o.value_cents").as("old_value_cents"),
          col("n.value_cents").as("new_value_cents"),
          when(col("o.user_id").isNull, "added")
            .when(col("n.user_id").isNull, "removed")
            .otherwise("changed").as("change"))
        .orderBy("user_id")
    },

    // ----- correlation matrix as integer-exact sufficient statistics -----
    // Pearson r for each measure pair is fully determined by (n, Σx, Σy,
    // Σx², Σy², Σxy); emitting THOSE as BIGINTs instead of the float r is
    // what makes a correlation matrix hash-gateable cross-engine (same
    // fixed-point stance as q_pagerank). Measures are scaled to integers at
    // the scan (whole dollars / whole units / discount %), the scan is
    // read ONCE (the oracle's 3-way UNION is re-shaped into one aggregate +
    // a 3-struct explode of the single output row), and all sums are
    // map-side combined. Magnitudes: Σx² ≤ 10¹⁰·rows — BIGINT-safe through
    // ~10⁸ rows per aggregation scope; beyond that the sums promote to
    // DECIMAL (ANSI mode makes an overflow loud, never silent).
    QueryDef(
      "q_corr_matrix",
      """WITH m AS (SELECT CAST(ROUND(l_extendedprice) AS BIGINT) AS price_usd,
        |                  CAST(l_quantity AS BIGINT) AS qty,
        |                  CAST(ROUND(l_discount*100) AS BIGINT) AS disc_pct
        |           FROM lineitem),
        |p AS (
        |  SELECT 'price_qty' AS pair, price_usd AS x, qty AS y FROM m
        |  UNION ALL SELECT 'price_disc', price_usd, disc_pct FROM m
        |  UNION ALL SELECT 'qty_disc', qty, disc_pct FROM m)
        |SELECT pair, COUNT(*) AS n,
        |       CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
        |       CAST(SUM(x*x) AS BIGINT) AS sum_xx, CAST(SUM(y*y) AS BIGINT) AS sum_yy,
        |       CAST(SUM(x*y) AS BIGINT) AS sum_xy
        |FROM p GROUP BY pair ORDER BY pair""".stripMargin) { (s, d) =>
      val m = Tables.lineitem(s, d).select(
        round(col("l_extendedprice")).cast("long").as("price_usd"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      val agg1 = m.agg(
        count(lit(1)).as("n"),
        sum(col("price_usd")).as("s_p"), sum(col("qty")).as("s_q"),
        sum(col("disc_pct")).as("s_d"),
        sum(col("price_usd") * col("price_usd")).as("s_pp"),
        sum(col("qty") * col("qty")).as("s_qq"),
        sum(col("disc_pct") * col("disc_pct")).as("s_dd"),
        sum(col("price_usd") * col("qty")).as("s_pq"),
        sum(col("price_usd") * col("disc_pct")).as("s_pd"),
        sum(col("qty") * col("disc_pct")).as("s_qd"))
      def pairStruct(pair: String, sx: String, sy: String, sxx: String,
          syy: String, sxy: String) =
        struct(lit(pair).as("pair"), col("n"),
          col(sx).as("sum_x"), col(sy).as("sum_y"), col(sxx).as("sum_xx"),
          col(syy).as("sum_yy"), col(sxy).as("sum_xy"))
      agg1.select(explode(array(
          pairStruct("price_qty", "s_p", "s_q", "s_pp", "s_qq", "s_pq"),
          pairStruct("price_disc", "s_p", "s_d", "s_pp", "s_dd", "s_pd"),
          pairStruct("qty_disc", "s_q", "s_d", "s_qq", "s_dd", "s_qd"))).as("r"))
        .select("r.*")
        .orderBy("pair")
    },

    // ----- Benford first-digit profile (fraud/anomaly screen) -----
    // First significant digit of the order totals in cents (integer string,
    // so digit extraction is exact); observed count + integral permille
    // share. Scan + 9-group aggregate; the permille window runs over 9 rows.
    QueryDef(
      "q_benford",
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
        |           FROM orders WHERE o_totalprice > 0),
        |d AS (SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c)
        |SELECT digit, COUNT(*) AS n_orders,
        |       CAST(COUNT(*) * 1000 // SUM(COUNT(*)) OVER () AS BIGINT) AS permille
        |FROM d GROUP BY digit ORDER BY digit""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_totalprice") > 0)
        .select(substring(round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders")).over(Window.partitionBy()))
        .select(col("digit"), col("n_orders"),
          expr("CAST(n_orders * 1000 DIV total AS BIGINT)").as("permille"))
        .orderBy("digit")
    },

    // ----- exact discrete quantiles per group (percentile_disc semantics) -----
    // p50/p90 of document length per source: smallest element whose rank
    // reaches ⌈p·n⌉, rank positions computed in INTEGER arithmetic
    // ((9n+9) DIV 10, not 0.9*n — float multiply would round differently at
    // exact-boundary group sizes). Both windows share the (source)
    // partitioning → one exchange; parallelism = number of groups, the
    // right shape when quantiles are per-stratum (a single global quantile
    // at 100 TB uses approx_percentile or the q_sample_weighted top-k path).
    QueryDef(
      "q_median_disc",
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, MAX(n) AS n_docs,
        |       MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
        |       MAX(CASE WHEN rn = (9*n + 9) // 10 THEN n_chars END) AS p90_chars
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val cw = Window.partitionBy("source")
      Tables.documents(s, d).select("source", "n_chars", "doc_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .groupBy("source").agg(
          max(col("n")).as("n_docs"),
          max(when(col("rn") === expr("(n + 1) DIV 2"), col("n_chars"))).as("p50_chars"),
          max(when(col("rn") === expr("(9*n + 9) DIV 10"), col("n_chars"))).as("p90_chars"))
        .orderBy("source")
    },

    // ----- equi-depth histogram per stratum (NTILE) -----
    // 8 equal-count buckets of document length per language, deterministic
    // under ties via the (n_chars, doc_id) total order. Partitioned window:
    // parallelism = strata count, per-stratum sort bounded by stratum size
    // (for one giant stratum the production face switches to
    // approx_percentile boundary estimation + width bucketing — noted, not
    // needed for per-language strata).
    QueryDef(
      "q_hist_equidepth",
      """WITH b AS (SELECT lang, n_chars,
        |                  CAST(NTILE(8) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
        |           FROM documents)
        |SELECT lang, bucket, COUNT(*) AS n_docs, MIN(n_chars) AS lo_chars,
        |       MAX(n_chars) AS hi_chars, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      Tables.documents(s, d).select("lang", "n_chars", "doc_id")
        .withColumn("bucket", ntile(8).over(w).cast("long"))
        .groupBy("lang", "bucket").agg(
          count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo_chars"),
          max(col("n_chars")).as("hi_chars"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("lang", "bucket")
    },

    // ----- time-weighted average per key (TWAP) -----
    // Each observation holds until the key's next event (LEAD over the
    // per-key timeline); the average weights values by that holding
    // duration — the metric a plain AVG silently gets wrong on irregular
    // feeds. Integer-exact end to end: cents × whole seconds, integral
    // division at the boundary. One exchange: LEAD and the final group
    // share the (user_id) partitioning.
    QueryDef(
      "q_twap",
      """WITH ev AS (SELECT user_id, event_id, CAST(ROUND(value*100) AS BIGINT) AS v_cents,
        |                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec
        |            FROM events WHERE user_id <= 80),
        |seg AS (SELECT user_id, v_cents, ts_sec,
        |               LEAD(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS next_sec
        |        FROM ev)
        |SELECT user_id, COUNT(*) AS n_segments,
        |       CAST(SUM(v_cents * (next_sec - ts_sec)) AS BIGINT) AS weighted_sum,
        |       CAST(SUM(next_sec - ts_sec) AS BIGINT) AS total_sec,
        |       CAST(SUM(v_cents * (next_sec - ts_sec)) // NULLIF(SUM(next_sec - ts_sec), 0) AS BIGINT) AS twap_cents
        |FROM seg WHERE next_sec IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      val ev = Tables.events(s, d).filter(col("user_id") <= 80)
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("v_cents"),
          col("ts").cast("long").as("ts_sec"))
      ev.withColumn("next_sec", lead(col("ts_sec"), 1).over(w))
        .filter(col("next_sec").isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).as("n_segments"),
          sum(col("v_cents") * (col("next_sec") - col("ts_sec"))).as("weighted_sum"),
          sum(col("next_sec") - col("ts_sec")).as("total_sec"))
        .select(col("user_id"), col("n_segments"), col("weighted_sum"), col("total_sec"),
          expr("CAST(weighted_sum DIV NULLIF(total_sec, 0) AS BIGINT)").as("twap_cents"))
        .orderBy("user_id")
    },

    // ----- weighted sampling without replacement (priority sampling) -----
    // Duffield, Lund & Thorup 2007: draw k items with priority u/w (u
    // uniform, w the weight) and keep the k SMALLEST priorities — an
    // unbiased weight-proportional sample. u is the repo's oracle-
    // rebuildable uniform: the first 48 bits of md5(doc_id), exact in a
    // double, so the ONLY float op is one IEEE division of two integers —
    // correctly rounded, therefore bit-identical cross-engine; it orders
    // rows and never reaches the output. Spark plans the k-smallest as
    // TakeOrderedAndProject (per-partition top-k + merge, no global sort),
    // the shape that holds at any corpus size; rank is then assigned over
    // the k survivors only.
    QueryDef(
      "q_sample_weighted",
      """WITH pri AS (
        |  SELECT doc_id, n_chars,
        |         CAST(('0x' || SUBSTR(MD5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS u48
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT doc_id, n_chars, u48,
        |             ROW_NUMBER() OVER (ORDER BY CAST(u48 AS DOUBLE) / n_chars, doc_id) AS rk
        |      FROM pri)
        |SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_chars, u48
        |FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin) { (s, d) =>
      val pri = Tables.documents(s, d).filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          SketchExpressions.md5Hi64(concat(lit("wsamp:"), col("doc_id").cast("string"))).as("h8"))
        .select(col("doc_id"), col("n_chars"),
          expr("shiftrightunsigned(h8, 16)").as("u48"))
        .withColumn("priority", col("u48").cast("double") / col("n_chars"))
      val top = pri.orderBy(col("priority"), col("doc_id")).limit(50)
      top.withColumn("rk",
          row_number().over(Window.orderBy("priority", "doc_id")).cast("long"))
        .select("rk", "doc_id", "n_chars", "u48")
        .orderBy("rk")
    },

    // ----- typo-class string distance (unrestricted Damerau-Levenshtein) -----
    // The native [[org.apache.spark.sql.graft.DamerauLevenshtein]]
    // expression gated against DuckDB's damerau_levenshtein on two pair
    // populations: sequential-key customer names (a co-partitioned
    // next-key join) and each name against its tail-transposed self (a
    // map-only derivation that MUST separate dl from plain levenshtein —
    // a transposition costs 1 vs 2). Output is the (pair_type, dl, lev)
    // histogram: integer-exact and tiny at any scale.
    QueryDef(
      "q_dl_distance",
      """WITH neigh AS (
        |  SELECT 'neighbor' AS pair_type,
        |         CAST(damerau_levenshtein(a.c_name, b.c_name) AS BIGINT) AS dl,
        |         CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
        |  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1),
        |swap AS (
        |  SELECT 'swap_tail' AS pair_type,
        |         CAST(damerau_levenshtein(c_name, CONCAT(SUBSTR(c_name, 1, LENGTH(c_name)-2),
        |                                                 SUBSTR(c_name, LENGTH(c_name), 1),
        |                                                 SUBSTR(c_name, LENGTH(c_name)-1, 1))) AS BIGINT) AS dl,
        |         CAST(levenshtein(c_name, CONCAT(SUBSTR(c_name, 1, LENGTH(c_name)-2),
        |                                         SUBSTR(c_name, LENGTH(c_name), 1),
        |                                         SUBSTR(c_name, LENGTH(c_name)-1, 1))) AS BIGINT) AS lev
        |  FROM customer)
        |SELECT pair_type, dl, lev, COUNT(*) AS n_pairs
        |FROM (SELECT * FROM neigh UNION ALL SELECT * FROM swap) t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val neigh = c.as("a").join(c.as("b"), col("b.c_custkey") === col("a.c_custkey") + 1)
        .select(lit("neighbor").as("pair_type"),
          StringDistanceFunctions.damerauLevenshtein(col("a.c_name"), col("b.c_name"))
            .cast("long").as("dl"),
          levenshtein(col("a.c_name"), col("b.c_name")).cast("long").as("lev"))
      val sw = c
        .withColumn("swapped",
          expr("concat(substr(c_name, 1, length(c_name)-2), " +
            "substr(c_name, length(c_name), 1), substr(c_name, length(c_name)-1, 1))"))
        .select(lit("swap_tail").as("pair_type"),
          StringDistanceFunctions.damerauLevenshtein(col("c_name"), col("swapped"))
            .cast("long").as("dl"),
          levenshtein(col("c_name"), col("swapped")).cast("long").as("lev"))
      neigh.unionAll(sw)
        .groupBy("pair_type", "dl", "lev").agg(count(lit(1)).as("n_pairs"))
        .orderBy("pair_type", "dl", "lev")
    },

    // ----- rolling-window distinct via mergeable HLL registers -----
    // 7-day rolling distinct active user-hours per day — the telemetry
    // metric that is notoriously UNscalable exactly: COUNT(DISTINCT) does
    // not decompose over sliding windows, so the exact form re-scans every
    // window (the oracle's 7× fan-out join). The sketch form does
    // decompose: per-(day, bucket) HLL registers (m = 128, md5-derived as
    // in q_distinct_hll so the oracle rebuilds them exactly), then each
    // day's window merge is a rolling MAX per bucket over a RANGE 6
    // PRECEDING frame — constant 128 rows per day regardless of corpus
    // size, each day's register set built ONCE and reused by all 7 windows
    // it participates in. Raw-HLL contract as before; the gate corpus's
    // smallest window (347) clears the 2.5·m = 320 correction threshold —
    // SketchSpec asserts that precondition so a testdata regen that breaks
    // it fails loudly. σ = 1.04/√128 ≈ 9.2%.
    //
    // Scale: the register build is one map-side-combined aggregate keyed
    // (day, bucket); the rolling merge partitions by bucket (128 ways)
    // and orders by day — days × 128 rows total, corpus-size-independent.
    // The exact face exists only as the gate's ground truth; at 100 TB
    // you ship the sketch column and drop it.
    QueryDef(
      "q_distinct_rolling_hll",
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |                  CAST(user_id AS VARCHAR) || ':' || CAST(date_trunc('hour', ts) AS VARCHAR) AS uh
        |           FROM events),
        |h AS (SELECT day, uh,
        |        CAST(('0x' || substr(md5('rh:' || uh), 1, 2)) AS BIGINT) % 128 AS bucket,
        |        CAST(('0x' || substr(md5('rh:' || uh), 3, 8)) AS BIGINT) AS hv
        |      FROM e),
        |rho AS (SELECT day, bucket,
        |               MAX(CASE WHEN hv = 0 THEN 33 ELSE 33 - length(bin(hv)) END) AS m
        |        FROM h GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM e),
        |grid AS (SELECT d.day, g.bucket
        |         FROM days d, (SELECT UNNEST(generate_series(0, 127)) AS bucket) g),
        |reg AS (SELECT g.day, g.bucket, COALESCE(r.m, 0) AS m,
        |               date_diff('day', DATE '1970-01-01', g.day) AS day_num
        |        FROM grid g LEFT JOIN rho r ON g.day = r.day AND g.bucket = r.bucket),
        |roll AS (SELECT day, bucket,
        |                MAX(m) OVER (PARTITION BY bucket ORDER BY day_num
        |                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS m
        |         FROM reg),
        |s AS (SELECT day, CAST(SUM(1::BIGINT << (33 - m)) AS BIGINT) AS ssum FROM roll GROUP BY 1),
        |est AS (SELECT day, (11719 * (1::BIGINT << 33)) // ssum AS n_est_7d FROM s),
        |exact AS (SELECT d.day, COUNT(DISTINCT e.uh) AS n_exact_7d
        |          FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day GROUP BY 1)
        |SELECT x.day, n_exact_7d, n_est_7d,
        |       ABS(n_est_7d - n_exact_7d) * 1000 // n_exact_7d AS err_permille
        |FROM exact x JOIN est ON x.day = est.day
        |ORDER BY x.day""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("ts").cast("date").as("day"),
        concat(col("user_id").cast("string"), lit(":"),
          date_trunc("hour", col("ts")).cast("string")).as("uh"))
      val rho = e
        .select(col("day"), SketchExpressions.md5Hi64(concat(lit("rh:"), col("uh"))).as("h8"))
        .select(col("day"),
          expr("shiftrightunsigned(h8, 56) % 128").as("bucket"),
          expr("shiftrightunsigned(h8, 24) & 4294967295").as("hv"))
        .groupBy("day", "bucket")
        .agg(max(SketchExpressions.hllRho32(col("hv"))).as("m"))
        .stableCheckpoint() // eager, ≤ days×128 rows; two consumers below
      val days = rho.select("day").distinct()
      val grid = days
        .select(col("day"), explode(expr("sequence(0, 127)")).as("b"))
        .select(col("day"), col("b").cast("long").as("bucket"))
      val reg = grid.join(rho, Seq("day", "bucket"), "left")
        .select(col("day"), col("bucket"), coalesce(col("m"), lit(0)).as("m"),
          datediff(col("day"), lit("1970-01-01").cast("date")).as("day_num"))
      val w = Window.partitionBy("bucket").orderBy("day_num").rangeBetween(-6, 0)
      val est = reg.withColumn("m", max("m").over(w))
        .groupBy("day")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - m)")).as("ssum"))
        .select(col("day"),
          expr("(11719 * CAST(8589934592 AS BIGINT)) DIV ssum").as("n_est_7d"))
      val exact = e
        .join(broadcast(days.select(col("day").as("d0"))),
          datediff(col("d0"), col("day")).between(0, 6))
        .groupBy(col("d0").as("day"))
        .agg(countDistinct("uh").as("n_exact_7d"))
      exact.join(est, "day")
        .select(col("day"), col("n_exact_7d"), col("n_est_7d"),
          expr("ABS(n_est_7d - n_exact_7d) * 1000 DIV n_exact_7d").as("err_permille"))
        .orderBy("day")
    },

    // ----- KMV set DIFFERENCE (theta-sketch A-not-B): daily churn -----
    // "How much of today's activity pattern is NEW vs yesterday?" — the
    // behavioral-churn metric over (user, hour-of-day) activity cells,
    // estimated from per-day KMV sketches alone: the A-not-B operation of
    // the DataSketches theta family. |A\B| = |A| − J·|A∪B| where J and
    // |A∪B| come from the merged k-min sketch (q_distinct_kmv_intersect's
    // machinery) and |A| from A's own sketch. KMV cardinality uses the
    // standard saturation rule: an unsaturated sketch (fewer than k
    // members) IS its set, so the estimator degrades to exact — both
    // branches integer-exact in both engines (48-bit md5 hashes,
    // (k−1)·2⁴⁸ // h_k). Estimates clamp at 0: a difference of two
    // estimates can cross zero on sketch noise, and a negative "new
    // users" row is a lie.
    //
    // Scale: per-day sketches are k=256 rows each, built by the salt-local
    // two-level k-min (never a full per-day sort); yesterday's sketch
    // meets today's by SHIFTING its day key forward one day — a keyed
    // union + rank over ≤ 2k rows per day. History never rescans: the
    // sketches are the state you keep.
    QueryDef(
      "q_distinct_anotb_kmv",
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |                  CAST(user_id AS VARCHAR) || ':' || CAST(EXTRACT(hour FROM ts) AS VARCHAR) AS uh
        |           FROM events),
        |du AS (SELECT DISTINCT day, uh FROM e),
        |h AS (SELECT day, uh,
        |        CAST(('0x' || substr(md5('ab:' || uh), 1, 12)) AS BIGINT) AS hv
        |      FROM du),
        |rk AS (SELECT day, hv, ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS r FROM h),
        |sk AS (SELECT day, hv FROM rk WHERE r <= 256),
        |own AS (SELECT day, COUNT(*) AS c, MAX(hv) AS hk FROM sk GROUP BY 1),
        |member AS (
        |  SELECT day, hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        |    SELECT day, hv, 1 AS in_a, 0 AS in_b FROM sk
        |    UNION ALL
        |    SELECT day + 1 AS day, hv, 0 AS in_a, 1 AS in_b FROM sk)
        |  GROUP BY 1, 2),
        |mrk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS r FROM member),
        |mstat AS (SELECT day, COUNT(*) AS rr, MAX(hv) AS hr,
        |                 CAST(SUM(in_a * in_b) AS BIGINT) AS ovl
        |          FROM mrk WHERE r <= 256 GROUP BY 1),
        |est AS (
        |  SELECT m.day,
        |         CASE WHEN o.c < 256 THEN o.c
        |              ELSE (255 * (1::BIGINT << 48)) // o.hk END AS n_a_est,
        |         CASE WHEN m.rr < 256 THEN m.rr
        |              ELSE (255 * (1::BIGINT << 48)) // m.hr END AS n_union_est,
        |         m.ovl, m.rr
        |  FROM mstat m JOIN own o ON m.day = o.day
        |  WHERE m.day > (SELECT MIN(day) FROM du)
        |    AND m.day <= (SELECT MAX(day) FROM du)),
        |exact AS (
        |  SELECT a.day, COUNT(*) AS n_today,
        |         CAST(SUM(CASE WHEN b.uh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_exact
        |  FROM du a LEFT JOIN du b ON b.day = a.day - 1 AND b.uh = a.uh
        |  WHERE a.day > (SELECT MIN(day) FROM du)
        |  GROUP BY 1)
        |SELECT x.day, n_today, n_new_exact,
        |       GREATEST(CAST(0 AS BIGINT),
        |                n_a_est - (ovl * n_union_est) // rr) AS n_new_est,
        |       ABS(GREATEST(CAST(0 AS BIGINT), n_a_est - (ovl * n_union_est) // rr)
        |           - n_new_exact) * 1000 // n_new_exact AS err_permille
        |FROM exact x JOIN est ON x.day = est.day
        |ORDER BY x.day""".stripMargin) { (s, d) =>
      val k = 256
      val du = Tables.events(s, d).select(
          col("ts").cast("date").as("day"),
          concat(col("user_id").cast("string"), lit(":"),
            hour(col("ts")).cast("string")).as("uh"))
        .distinct()
        .stableCheckpoint() // eager: feeds the sketch AND both exact sides
      val h = du.select(col("day"),
          SketchExpressions.md5Hi64(concat(lit("ab:"), col("uh"))).as("h8"))
        .select(col("day"), expr("shiftrightunsigned(h8, 16)").as("hv"))
      // bounded k-min aggregate: every partial holds ≤ k longs regardless
      // of the day's distinct volume (KMinAgg — the r12-advice fix for
      // the collect_set+slice shape, applied engine-wide)
      val wd = Window.partitionBy("day").orderBy("hv")
      val sk = h
        .filter(col("hv").isNotNull) // null-skip parity with collect_set
        .groupBy(col("day"))
        .agg(graft.functions.KMinAgg.kmin(col("hv"), k).as("mins"))
        .select(col("day"), explode(col("mins")).as("hv"))
        .stableCheckpoint() // eager: consumed by own stats + both member arms
      val own = sk.groupBy("day").agg(count(lit(1)).as("c"), max("hv").as("hk"))
      val member = sk.select(col("day"), col("hv"), lit(1).as("in_a"), lit(0).as("in_b"))
        .unionByName(sk.select(date_add(col("day"), 1).as("day"), col("hv"),
          lit(0).as("in_a"), lit(1).as("in_b")))
        .groupBy("day", "hv")
        .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      val mstat = member.withColumn("r", row_number().over(wd)).filter(col("r") <= k)
        .groupBy("day")
        .agg(count(lit(1)).as("rr"), max("hv").as("hr"),
          sum(expr("in_a * in_b")).as("ovl"))
      val bounds = du.agg(min("day").as("d_min"), max("day").as("d_max"))
      val est = mstat.join(own, "day")
        .crossJoin(broadcast(bounds))
        .filter(col("day") > col("d_min") && col("day") <= col("d_max"))
        .select(col("day"),
          expr(s"IF(c < $k, c, (${k - 1} * shiftleft(CAST(1 AS BIGINT), 48)) DIV hk)").as("n_a_est"),
          expr(s"IF(rr < $k, rr, (${k - 1} * shiftleft(CAST(1 AS BIGINT), 48)) DIV hr)").as("n_union_est"),
          col("ovl"), col("rr"))
      val exact = du.as("a")
        .join(du.as("b"),
          datediff(col("a.day"), col("b.day")) === 1 && col("a.uh") === col("b.uh"),
          "left")
        .crossJoin(broadcast(bounds))
        .filter(col("a.day") > col("d_min"))
        .groupBy(col("a.day").as("day"))
        .agg(count(lit(1)).as("n_today"),
          sum(when(col("b.uh").isNull, 1L).otherwise(0L)).as("n_new_exact"))
      exact.join(est, "day")
        .withColumn("n_new_est",
          greatest(lit(0L), expr("n_a_est - (ovl * n_union_est) DIV rr")))
        .select(col("day"), col("n_today"), col("n_new_exact"), col("n_new_est"),
          expr("ABS(n_new_est - n_new_exact) * 1000 DIV n_new_exact").as("err_permille"))
        .orderBy("day")
    },

    // ----- A/B experiment readout: 2×2 chi-square, integer arithmetic -----
    // The experimentation workload: users split by id parity, conversion =
    // purchase event; per-variant conversion rates plus Pearson's
    // chi-square χ² = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) as a ×10⁶ integer.
    // The naive product N·det²·10⁶ overflows BIGINT at bench scale, so the
    // statistic is computed with pre-scaled integer divisions
    // (N·(det/10³)² / (D/10¹²) — same ×10⁶ units, each truncation applied
    // identically by both engines, headroom to N ≈ 10⁸ events). One scan,
    // one 4-cell aggregate — the whole test is map-side combined; at
    // 100 TB per-experiment cells come from the same single pass keyed by
    // experiment id.
    QueryDef(
      "q_ab_chisq",
      """WITH e AS (SELECT user_id % 2 AS variant,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |           FROM events),
        |c AS (SELECT CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |             CAST(SUM(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |             CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |             CAST(SUM(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d2
        |      FROM e)
        |SELECT a AS conv_a, b AS nonconv_a, c2 AS conv_b, d2 AS nonconv_b,
        |       a * 1000 // (a + b) AS rate_a_permille,
        |       c2 * 1000 // (c2 + d2) AS rate_b_permille,
        |       CAST(((a + b + c2 + d2)
        |             * ((a * d2 - b * c2) // 1000)
        |             * ((a * d2 - b * c2) // 1000))
        |            // (((a + b) * (c2 + d2) // 1000000)
        |               * ((a + c2) * (b + d2) // 1000000)) AS BIGINT) AS chi2_x1e6
        |FROM c""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select((col("user_id") % 2).as("variant"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("conv"))
        .agg(
          sum(expr("CAST(IF(variant = 0 AND conv = 1, 1, 0) AS BIGINT)")).as("conv_a"),
          sum(expr("CAST(IF(variant = 0 AND conv = 0, 1, 0) AS BIGINT)")).as("nonconv_a"),
          sum(expr("CAST(IF(variant = 1 AND conv = 1, 1, 0) AS BIGINT)")).as("conv_b"),
          sum(expr("CAST(IF(variant = 1 AND conv = 0, 1, 0) AS BIGINT)")).as("nonconv_b"))
        .select(col("conv_a"), col("nonconv_a"), col("conv_b"), col("nonconv_b"),
          expr("conv_a * 1000 DIV (conv_a + nonconv_a)").as("rate_a_permille"),
          expr("conv_b * 1000 DIV (conv_b + nonconv_b)").as("rate_b_permille"),
          expr("""CAST(((conv_a + nonconv_a + conv_b + nonconv_b)
                 * ((conv_a * nonconv_b - nonconv_a * conv_b) DIV 1000)
                 * ((conv_a * nonconv_b - nonconv_a * conv_b) DIV 1000))
                DIV (((conv_a + nonconv_a) * (conv_b + nonconv_b) DIV 1000000)
                   * ((conv_a + conv_b) * (nonconv_a + nonconv_b) DIV 1000000)) AS BIGINT)""")
            .as("chi2_x1e6"))
    },

    // ----- bounded quantile sketch over an UNBOUNDED domain -----
    // graft.functions.QuantileSketch: HDR-style exponent/mantissa buckets
    // (≤1888 over all non-negative longs, integer-exact in both engines
    // via bin()-string exponents), read out at p50/p90/p99 per order
    // priority over whole-dollar order totals. The selected bucket
    // CONTAINS the exact ⌈q·n⌉-th order statistic by construction
    // (rank error 0, value error ≤ bucket width ≤ 2^−5 relative) — the
    // gate emits both bounds, the exact discrete percentile, and the
    // containment flag, all BIGINT. Production reads only the additive
    // (bucket, count) state; the exact side (a per-group sort) exists
    // here to VERIFY the bound, like q_stream_quantile_hist's exact twin.
    QueryDef(
      "q_quantile_sketch", {
        import graft.functions.QuantileSketch
        s"""WITH qsv AS (SELECT o_orderpriority AS grp,
           |                    CAST(FLOOR(o_totalprice) AS BIGINT) AS v
           |             FROM orders),
           |${QuantileSketch.readoutSql("grp")}""".stripMargin
      }) { (s, d) =>
      import graft.functions.QuantileSketch
      val v = Tables.orders(s, d).select(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice")).cast("long").as("v"))
      val counts = v.groupBy(col("grp"), QuantileSketch.bucketOf(col("v")).as("id"))
        .agg(count(lit(1)).as("cnt"))
      val totals = v.groupBy("grp").agg(count(lit(1)).as("n"))
      QuantileSketch.readout(counts, totals, v, "grp")
    }
  )
}
