package graft.analytics

import graft.QueryDef
import graft.functions.SnowflakeFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.3–§2.10) re-expressed over the
  * driver testdata. Each query mirrors an expression shape used by the
  * reference's analytics suite (sql/2.verify_snapshot.sql,
  * sql/4.analytics_queries.sql) and carries a DuckDB oracle.
  *
  * Scale notes (100 TB design intent), applied throughout:
  *  - dimension joins (`region`, `nation`, `customer`, `supplier`, `part`)
  *    are explicitly `broadcast()` — no shuffle of the fact table;
  *  - aggregations are plain `groupBy` so Catalyst plans partial+final
  *    hash aggregation (map-side combine) automatically;
  *  - top-k is `orderBy().limit(k)` which plans TakeOrderedAndProject —
  *    no global sort;
  *  - percent-of-total windows run AFTER aggregation, over the (tiny)
  *    aggregated result, never over the fact table;
  *  - money arithmetic goes through DECIMAL so results are exact and
  *    reproducible at any parallelism (see SnowflakeFunctions.dec2).
  */
object RelationalQueries {

  // Deterministic anchor dates (the reference uses CURRENT_DATE; SURVEY §7.4.3
  // requires an injectable clock for reproducible results — these are the
  // frozen "now" for oracle-checked runs, inside the data's 1995–2001 range).
  private val AnchorTs = "TIMESTAMP '2000-01-01 00:00:00'"

  val defs: Seq[QueryDef] = Seq(

    // ----- A1/A3/A4 + F11/F14: grouped aggregate with exact money math -----
    // Shape of sql/2.verify_snapshot.sql:121-137 + sql/4.analytics_queries.sql:211-215.
    QueryDef(
      "q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val discPrice = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
      l.filter(col("l_shipdate") <= lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(discPrice * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- P2/P3: IN-list + date-range predicates (pushed to the scan) -----
    // Shape of sql/4.analytics_queries.sql:90-92 (status IN + DATEADD range).
    QueryDef(
      "q_filter_in_range",
      """SELECT o_orderpriority, COUNT(*) AS order_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderstatus IN ('O','P')
        |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "P") &&
          col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("order_count"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    },

    // ----- P1: narrow projection + comparison filter (column pruning) -----
    QueryDef(
      "q_proj_filter",
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy("o_orderkey")
    },

    // ----- P4/P5: NULL + compound boolean predicates -----
    // Shape of sql/2.verify_snapshot.sql:85-119 (data-quality NULL checks) via
    // NULLIF-manufactured nulls, plus OR-of-ranges (sql/4.analytics_queries.sql:402-403).
    QueryDef(
      "q_filter_null_compound",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_customers,
        |       COUNT(NULLIF(c_acctbal < 0, FALSE)) AS n_negative,
        |       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_bal,
        |       CAST(SUM(CASE WHEN c_acctbal > 9000 OR c_acctbal < -900 THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          count(nullif(col("c_acctbal") < 0, lit(false))).as("n_negative"),
          sum(when(col("c_acctbal").isNull, 1).otherwise(0)).as("n_null_bal"),
          sum(when(col("c_acctbal") > 9000 || col("c_acctbal") < -900, 1).otherwise(0)).as("n_extreme"))
        .orderBy("c_mktsegment")
    },

    // ----- J1: 2-way inner equi-join, broadcast dimension -----
    // Shape of sql/4.analytics_queries.sql:198-199 (visits ⋈ doctors revenue).
    QueryDef(
      "q_join_2way",
      """SELECT c_mktsegment, COUNT(*) AS order_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("order_count"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    },

    // ----- J2: multi-way inner join through the dimension chain -----
    // Shape of sql/4.analytics_queries.sql:56-58 (appointments⋈patients⋈doctors),
    // widened to the classic local-supplier revenue shape to exercise 4 joins.
    QueryDef(
      "q_join_multiway",
      """SELECT n_name, COUNT(*) AS order_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name IN ('ASIA','EUROPE')
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name").isin("ASIA", "EUROPE"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("order_count"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ----- J3 + A1: LEFT join keeping unmatched left rows; COUNT(col) NULL-skipping -----
    // Shape of sql/4.analytics_queries.sql:74-75 (doctors LEFT JOIN appointments).
    QueryDef(
      "q_join_left",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_rows,
        |       COUNT(o_orderkey) AS n_orders,
        |       COUNT(DISTINCT c_custkey) AS n_customers
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // ----- J4: LEFT join with extra predicate in the ON clause (not WHERE) -----
    // The semantic trap of sql/4.analytics_queries.sql:75,163-165 — the date
    // filter must ride in the join condition to preserve unmatched left rows.
    QueryDef(
      "q_join_left_on_pred",
      """SELECT c_mktsegment,
        |       COUNT(DISTINCT c.c_custkey) AS n_customers,
        |       COUNT(DISTINCT CASE WHEN o.o_orderkey IS NOT NULL THEN c.c_custkey END) AS n_active_2000,
        |       COUNT(o.o_orderkey) AS n_orders_2000
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey
        | AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        | AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      Tables.customer(s, d)
        .join(o,
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("2001-01-01 00:00:00").cast("timestamp"),
          "left")
        .groupBy("c_mktsegment")
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          countDistinct(when(col("o_orderkey").isNotNull, col("c_custkey"))).as("n_active_2000"),
          count(col("o_orderkey")).as("n_orders_2000"))
        .orderBy("c_mktsegment")
    },

    // ----- J5 + A9: join to a derived aggregate (CTE) + HAVING -----
    // Shape of sql/4.analytics_queries.sql:343-346 (visits ⋈ patient_visits CTE).
    QueryDef(
      "q_join_derived_having",
      """WITH cust_orders AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
        |)
        |SELECT c_mktsegment,
        |       COUNT(*) AS heavy_customers,
        |       CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS heavy_spend,
        |       MAX(n_orders) AS max_orders
        |FROM cust_orders j JOIN customer c ON j.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val heavy = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("spend"))
        .filter(col("n_orders") >= 12) // HAVING = post-aggregate filter
      heavy
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("heavy_customers"),
          sum(dec2(col("spend"))).cast("double").as("heavy_spend"),
          max(col("n_orders")).as("max_orders"))
        .orderBy("c_mktsegment")
    },

    // ----- J6 (beyond ref): FULL OUTER join — two-sided reconciliation -----
    // The audit shape CDC pipelines run constantly (which keys exist on
    // only one side?): clickers FULL OUTER purchasers over the same window,
    // 34 exclusive users on EACH side at sf0.01 so both null-extension
    // directions are exercised. Both inputs are aggregates keyed on the
    // join key, so the join co-partitions with its inputs — one exchange
    // per side, reused from the aggregation.
    QueryDef(
      "q_join_full_outer",
      """WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events
        |           WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |           GROUP BY user_id),
        |p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |      GROUP BY user_id)
        |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        |       COALESCE(n_clicks, 0) AS n_clicks,
        |       COALESCE(n_purchases, 0) AS n_purchases,
        |       (c.user_id IS NULL) AS purchase_only,
        |       (p.user_id IS NULL) AS click_only
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      def side(typ: String, as: String) = ev
        .filter(col("event_type") === typ)
        .groupBy(col("user_id").as(s"${as}_user"))
        .agg(count(lit(1)).as(s"n_$as"))
      side("click", "clicks")
        .join(side("purchase", "purchases"),
          col("clicks_user") === col("purchases_user"), "full_outer")
        .select(
          coalesce(col("clicks_user"), col("purchases_user")).as("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          col("clicks_user").isNull.as("purchase_only"),
          col("purchases_user").isNull.as("click_only"))
        .orderBy("user_id")
    },

    // ----- Scale tool: two-phase salted aggregation (SkewUtils) -----
    // events has 5 event_type keys over every row — the classic hot-key
    // aggregate where one reducer absorbs 20% of the table. The salted plan
    // splits each key across 16 deterministic salts for the partial phase
    // and merges 5×16 partials in a second (tiny) aggregate. The oracle is
    // the PLAIN group-by: salting must be a pure execution-strategy change,
    // bit-identical results (the money sum rides DECIMAL so partial/merge
    // order cannot perturb it — the no-raw-double-sums rule).
    QueryDef(
      "q_skew_salted_agg",
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.functions.SkewUtils.saltedAggregate(
        Tables.events(s, d).select("event_type", "value", "event_id"),
        keys = Seq("event_type"), salts = 16, saltCols = Seq("event_id"))(
        partial = Seq(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("s")),
        merge = Seq(
          sum(col("n")).as("n_events"),
          sum(col("s")).cast("double").as("total_value")))
        .orderBy("event_type")
    },

    // ----- Scale tool: salted equi-join (SkewUtils.saltedJoin) -----
    // The join-side counterpart of q_skew_salted_agg: events' 5 hot
    // event_type keys joined to a tiny derived dim. saltedJoin replicates
    // the dim once per salt and spreads each hot key's rows across 8
    // deterministic salts, so no single task absorbs a whole key at scale.
    // The oracle is the PLAIN join + group-by: salting must be a pure
    // execution-strategy change — bit-identical results (weighted sum rides
    // DECIMAL so partial order cannot perturb it).
    QueryDef(
      "q_skew_salted_join",
      """WITH dim AS (SELECT DISTINCT event_type AS dim_type,
        |                    LENGTH(event_type) AS weight FROM events)
        |SELECT e.event_type, CAST(e.ts AS DATE) AS day, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,6)) * weight) AS DOUBLE)
        |         AS weighted_value
        |FROM events e JOIN dim d ON e.event_type = d.dim_type
        |GROUP BY 1, 2
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("event_type", "ts", "value", "event_id")
      val dim = ev.select(col("event_type").as("dim_type")).distinct()
        .withColumn("weight", length(col("dim_type")))
      graft.functions.SkewUtils.saltedJoin(ev, dim, "event_type", "dim_type",
          salts = 8, saltCols = Seq("event_id"))
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)") * col("weight"))
            .cast("double").as("weighted_value"))
        .orderBy("event_type", "day")
    },

    // ----- A2: multi COUNT(DISTINCT) in one aggregate -----
    // Shape of sql/4.analytics_queries.sql:439-450 (CDC executive summary).
    QueryDef(
      "q_count_distinct_multi",
      """SELECT event_type,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("ts").cast("date")).as("n_days"))
        .orderBy("event_type")
    },

    // ----- A4/A5/A6/A7: conditional aggregation + guarded rate -----
    // Shape of sql/2.verify_snapshot.sql:147-148 + sql/4.analytics_queries.sql:70-72,117-118.
    QueryDef(
      "q_cond_agg_rates",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_large,
        |       100.0 * SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0) AS finished_rate,
        |       100.0 * COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) / NULLIF(COUNT(*), 0) AS large_rate
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val finished = sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
      val large = count(when(col("o_totalprice") > 200000, 1))
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          finished.as("n_finished"),
          large.as("n_large"),
          (lit(100.0) * finished / nullif(count(lit(1)).cast("double"), lit(0.0))).as("finished_rate"),
          (lit(100.0) * large / nullif(count(lit(1)).cast("double"), lit(0.0))).as("large_rate"))
        .orderBy("o_orderpriority")
    },

    // ----- A8: GROUP BY expression (year/month derived keys) -----
    // Shape of sql/4.analytics_queries.sql:250-258 (monthly trends via TO_CHAR).
    QueryDef(
      "q_group_by_expr",
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy(
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("order_year", "order_month")
    },

    // ----- A10: global (no-group) KPI aggregate -----
    // Shape of sql/4.analytics_queries.sql:438-454 (executive one-row summary).
    QueryDef(
      "q_global_kpi",
      s"""SELECT COUNT(*) AS n_orders,
         |       COUNT(DISTINCT o_custkey) AS n_customers,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value,
         |       CAST(MIN(o_orderdate) AS DATE) AS first_order,
         |       CAST(MAX(o_orderdate) AS DATE) AS last_order,
         |       CAST(SUM(CASE WHEN o_orderdate >= $AnchorTs THEN 1 ELSE 0 END) AS BIGINT) AS orders_since_2000
         |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_revenue"),
          (sum(dec2(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_order_value"),
          min(col("o_orderdate")).cast("date").as("first_order"),
          max(col("o_orderdate")).cast("date").as("last_order"),
          sum(when(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"), 1).otherwise(0)).as("orders_since_2000"))
    },

    // ----- W1: percent-of-total via SUM(COUNT(*)) OVER () after aggregation -----
    // Shape of sql/2.verify_snapshot.sql:121-137 (status distribution + pct).
    QueryDef(
      "q_pct_of_total",
      """SELECT o_orderstatus, COUNT(*) AS status_count,
        |       100.0 * COUNT(*) / SUM(COUNT(*)) OVER () AS pct
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      // Two-step plan: hash-aggregate the fact table first (shuffles 3 rows),
      // then window over the aggregated result — the window never sees raw data.
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("status_count"))
        .withColumn("pct",
          lit(100.0) * col("status_count") / sum(col("status_count")).over(Window.partitionBy()))
        .orderBy("o_orderstatus")
    },

    // ----- W2/W3: SUM(SUM(x)) OVER (PARTITION BY …) — pct within a partition -----
    // Shape of sql/4.analytics_queries.sql:228,294-302 (% within specialization).
    QueryDef(
      "q_pct_within_partition",
      """SELECT event_type, CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
        |       100.0 * COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS pct_of_type
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
        |GROUP BY event_type, CAST(ts AS DATE)
        |ORDER BY event_type, event_date""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"), col("ts").cast("date").as("event_date"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct_of_type",
          lit(100.0) * col("n") / sum(col("n")).over(Window.partitionBy("event_type")))
        .orderBy("event_type", "event_date")
    },

    // ----- W4: ranking/navigation window functions -----
    // RANK/DENSE_RANK over a DELIBERATELY tied key (order priority alone,
    // NO tiebreak — the tie behavior is what distinguishes them from
    // row_number, and rank values depend only on the key multiset, so they
    // are deterministic without one). The ORDER-dependent windows (LAG,
    // NTILE) DO carry o_orderkey tiebreaks to be total. Rank-family
    // outputs are int32 in Spark → cast BIGINT at the boundary
    // (no-narrow-types rule). All windows partition by customer — one hash
    // exchange shared by the three orderings (a sort each), never a global
    // single-partition window.
    QueryDef(
      "q_window_funcs",
      """SELECT o_custkey, o_orderkey,
        |       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
        |       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_dense_rank,
        |       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
        |       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_quartile
        |FROM orders WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val byPrio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
      val byDate = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val byPrice = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(byPrio).cast("long").as("prio_rank"),
          dense_rank().over(byPrio).cast("long").as("prio_dense_rank"),
          lag("o_orderkey", 1).over(byDate).as("prev_orderkey"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ----- RANGE-frame window: 7-day trailing totals over a daily rollup -----
    // The moving-aggregate class the ROWS-frame queries don't cover: the
    // frame is value-based (RANGE BETWEEN 6 PRECEDING on an integer day
    // number), so calendar gaps are handled by the frame itself, not by
    // densifying rows. Two-stage shape that survives 100×: the daily
    // rollup reduces the fact table to a bounded (priority × day) series
    // FIRST (map-side combine), and the window runs over that small series
    // partitioned by priority — never over raw orders, never a single
    // global partition. Revenue flows as DECIMAL-exact integer cents, so
    // the trailing sum is BIGINT addition — order-independent in both
    // engines; the DOUBLE face is a single cast+divide at the boundary.
    QueryDef(
      "q_window_moving",
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num,
        |         COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |  FROM orders
        |  GROUP BY 1, 2
        |)
        |SELECT prio, day_num, n_orders,
        |       CAST(SUM(n_orders) OVER w AS BIGINT) AS trail7_orders,
        |       CAST(CAST(SUM(rev_cents) OVER w AS BIGINT) AS DOUBLE) / 100 AS trail7_revenue
        |FROM daily
        |WINDOW w AS (PARTITION BY prio ORDER BY day_num
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY prio, day_num""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(
          col("o_orderpriority").as("prio"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("day_num"))
        .agg(
          count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("rev_cents"))
      val w = Window.partitionBy("prio").orderBy("day_num").rangeBetween(-6, 0)
      daily
        .select(col("prio"), col("day_num"), col("n_orders"),
          sum(col("n_orders")).over(w).as("trail7_orders"),
          (sum(col("rev_cents")).over(w).cast("double") / 100).as("trail7_revenue"))
        .orderBy("prio", "day_num")
    },

    // ----- L1: LISTAGG(DISTINCT … ) WITHIN GROUP (ORDER BY …) -----
    // Shape of sql/4.analytics_queries.sql:37 (distinct ordered time slots).
    QueryDef(
      "q_listagg_distinct",
      """SELECT r_name,
        |       STRING_AGG(DISTINCT n_name, ', ' ORDER BY n_name) AS nations,
        |       COUNT(DISTINCT n_name) AS n_nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          listaggDistinctOrdered(col("n_name"), ", ").as("nations"),
          countDistinct(col("n_name")).as("n_nations"))
        .orderBy("r_name")
    },

    // ----- O3: top-k = ORDER BY + LIMIT (TakeOrderedAndProject, no global sort) -----
    // Shape of sql/4.analytics_queries.sql:246-247 (top-10 revenue).
    QueryDef(
      "q_topk_customers",
      """SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },

    // ----- O2: ORDER BY … DESC NULLS LAST over a null-producing LEFT join -----
    // Shape of semantic-models/healthcare_cdc_semantic_model.yaml:617,646.
    QueryDef(
      "q_order_nulls_last",
      """SELECT c.c_custkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS jan95_spend
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey
        | AND o.o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
        |WHERE c.c_custkey <= 100
        |GROUP BY c.c_custkey
        |ORDER BY jan95_spend DESC NULLS LAST, c_custkey
        |LIMIT 50""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") <= 100)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") < lit("1995-02-01 00:00:00").cast("timestamp"),
          "left")
        .groupBy("c_custkey")
        .agg(sum(dec2(col("o_totalprice"))).cast("double").as("jan95_spend"))
        .orderBy(col("jan95_spend").desc_nulls_last, col("c_custkey"))
        .limit(50)
    },

    // ----- U1: UNION ALL of labeled aggregates -----
    // Shape of sql/2.verify_snapshot.sql:22-29 (per-table record counts).
    QueryDef(
      "q_union_all_counts",
      """SELECT 'orders' AS table_name, COUNT(*) AS record_count FROM orders
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'events', COUNT(*) FROM events
        |ORDER BY table_name""".stripMargin) { (s, d) =>
      def labeled(name: String) =
        Tables.load(s, d, name).agg(count(lit(1)).as("record_count"))
          .select(lit(name).as("table_name"), col("record_count"))
      labeled("orders")
        .unionAll(labeled("lineitem"))
        .unionAll(labeled("customer"))
        .unionAll(labeled("supplier"))
        .unionAll(labeled("events"))
        .orderBy("table_name")
    },

    // ----- F2/F5/F7/F8: date/time scalar shims -----
    // TO_CHAR patterns, DATE_TRUNC hour, TIMESTAMPDIFF minutes, DATEADD.
    QueryDef(
      "q_scalar_datetime",
      """SELECT event_type,
        |       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M') AS first_seen,
        |       STRFTIME(MAX(ts), '%Y-%m-%d %H:%M') AS last_seen,
        |       DATE_DIFF('minute', MIN(ts), MAX(ts)) AS span_minutes,
        |       COUNT(DISTINCT DATE_TRUNC('hour', ts)) AS active_hours,
        |       CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS last_week_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          sfToChar(min(col("ts")), "YYYY-MM-DD HH24:MI").as("first_seen"),
          sfToChar(max(col("ts")), "YYYY-MM-DD HH24:MI").as("last_seen"),
          sfTimestampDiffMinutes(min(col("ts")), max(col("ts"))).as("span_minutes"),
          countDistinct(date_trunc("hour", col("ts"))).as("active_hours"),
          sum(when(col("ts") >= lit("2024-01-31 00:00:00").cast("timestamp") - expr("INTERVAL 7 DAYS"), 1).otherwise(0)).as("last_week_events"))
        .orderBy("event_type")
    },

    // ----- F1/F13: string concat + searched-CASE bucketing -----
    // Shape of sql/2.verify_snapshot.sql:143,190-196 (names; age buckets).
    QueryDef(
      "q_case_buckets",
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS balance_bucket,
        |       COUNT(*) AS n_customers,
        |       STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |       MIN(c_name || '#' || c_mktsegment) AS sample_tag
        |FROM customer
        |GROUP BY 1
        |ORDER BY balance_bucket""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high").as("balance_bucket"))
        .agg(
          count(lit(1)).as("n_customers"),
          listaggDistinctOrdered(col("c_mktsegment"), ",").as("segments"),
          min(concat(col("c_name"), lit("#"), col("c_mktsegment"))).as("sample_tag"))
        .orderBy("balance_bucket")
    },

    // ----- Set operations beyond UNION ALL: INTERSECT / EXCEPT -----
    // (absent from the reference's surface — SURVEY §2.9 — but part of a
    // complete analytics engine; both plan as joins, not materialized sets)
    QueryDef(
      "q_set_intersect_except",
      """SELECT 'repeat_customers' AS op, COUNT(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |UNION ALL
        |SELECT 'never_ordered', COUNT(*) FROM (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey FROM orders)
        |ORDER BY op""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val recent = o.filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
      val early = o.filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
      val repeat = recent.intersect(early)
        .agg(count(lit(1)).as("n")).select(lit("repeat_customers").as("op"), col("n"))
      val never = Tables.customer(s, d).select(col("c_custkey"))
        .except(o.select(col("o_custkey")))
        .agg(count(lit(1)).as("n")).select(lit("never_ordered").as("op"), col("n"))
      repeat.unionAll(never).orderBy("op")
    },

    // ----- Semi / anti joins (EXISTS / NOT EXISTS) -----
    // Plan as LeftSemi/LeftAnti hash joins — the probe side streams, the
    // build side holds only join keys; never a full join + distinct.
    QueryDef(
      "q_semi_anti_join",
      """SELECT 'with_urgent_order' AS cohort, COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'without_urgent_order', COUNT(*),
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY cohort""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      def cohort(name: String, joinType: String) =
        c.join(urgent, col("c_custkey") === col("o_custkey"), joinType)
          .agg(count(lit(1)).as("n_customers"),
            sum(dec2(col("c_acctbal"))).cast("double").as("acctbal_sum"))
          .select(lit(name).as("cohort"), col("n_customers"), col("acctbal_sum"))
      cohort("with_urgent_order", "left_semi")
        .unionAll(cohort("without_urgent_order", "left_anti"))
        .orderBy("cohort")
    },

    // ----- PIVOT: status × priority count grid -----
    // Fixed value list → deterministic schema (no extra distinct pass);
    // plans as ONE hash aggregate with pivot expressions, not N self-joins.
    QueryDef(
      "q_pivot_status",
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f"),
          coalesce(col("O"), lit(0L)).as("o"),
          coalesce(col("P"), lit(0L)).as("p"))
        .orderBy("o_orderpriority")
    },

    // ----- UNPIVOT: wide measure columns → long (measure, value) form -----
    // The inverse of q_pivot_status, via Dataset.unpivot (Spark's melt):
    // per-returnflag sums of the four lineitem measures rotate into 4 rows
    // per flag. Sums ride DECIMAL before the DOUBLE boundary (the
    // no-raw-double-sums rule); unpivot itself is a zero-shuffle Expand —
    // the only exchanges are the aggregate's.
    QueryDef(
      "q_unpivot_measures",
      """WITH s AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS quantity,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS extendedprice,
        |         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS discount,
        |         CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS tax
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'quantity' AS measure, quantity AS value FROM s
        |  UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM s
        |  UNION ALL SELECT l_returnflag, 'discount', discount FROM s
        |  UNION ALL SELECT l_returnflag, 'tax', tax FROM s)
        |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      def m(c: String) = sum(col(c).cast("decimal(18,6)")).cast("double")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(m("l_quantity").as("quantity"), m("l_extendedprice").as("extendedprice"),
          m("l_discount").as("discount"), m("l_tax").as("tax"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // ----- ROLLUP / CUBE: hierarchical + full subtotal grids -----
    QueryDef(
      "q_rollup_revenue",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))
        .orderBy("status", "priority")
    },

    QueryDef(
      "q_cube_counts",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // ----- GROUPING SETS: arbitrary subtotal combinations -----
    // ROLLUP/CUBE cover the hierarchical and full grids; real reporting
    // workloads also ask for a hand-picked set of grouping combinations
    // (here: (status,priority), (status), (priority) — the CUBE minus the
    // grand total). GROUPING() indicators disambiguate a genuine NULL key
    // from a subtotal row, which COALESCE alone cannot. One pass over the
    // fact table: Catalyst plans a single Expand + partial/final hash
    // aggregate, so the cost is |sets| × map-side rows, never |sets| scans.
    QueryDef(
      "q_grouping_sets",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, g_priority, status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(
            Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")),
            Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"),
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("g_status"), col("g_priority"),
          col("n_orders"), col("revenue"))
        .orderBy("g_status", "g_priority", "status", "priority")
    },

    // ----- F6/F9: Snowflake DATEDIFF(year) + DAYOFWEEK numbering shims -----
    QueryDef(
      "q_sf_date_shims",
      """SELECT CAST(EXTRACT(year FROM TIMESTAMP '2000-06-15 00:00:00') - EXTRACT(year FROM o_orderdate) AS INT) AS years_ago,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT CAST(EXTRACT(dow FROM o_orderdate) AS INT)) AS distinct_weekdays,
        |       MIN(CAST(EXTRACT(dow FROM o_orderdate) AS INT)) AS min_dow
        |FROM orders
        |GROUP BY 1
        |ORDER BY years_ago""".stripMargin) { (s, d) =>
      // Snowflake DATEDIFF(year,a,b)=year(b)-year(a); DAYOFWEEK 0=Sun..6=Sat
      // (DuckDB's EXTRACT(dow) shares the 0=Sunday convention).
      Tables.orders(s, d)
        .groupBy(sfDateDiffYears(col("o_orderdate"),
          lit("2000-06-15 00:00:00").cast("timestamp")).as("years_ago"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(sfDayOfWeek(col("o_orderdate"))).as("distinct_weekdays"),
          min(sfDayOfWeek(col("o_orderdate"))).as("min_dow"))
        .orderBy("years_ago")
    },

    // ----- Dialect-as-SQL-text: the registered shims end-to-end -----
    // The Spark side is spark.sql(...) over the FunctionRegistry-registered
    // Snowflake shims (DialectFunctions) — proving a reference user can run
    // dialect queries as TEXT against the engine, not just via the Column
    // API. Same expression trees as the Column shims → same codegen.
    QueryDef(
      "q_sql_dialect",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       COUNT(*) AS n_orders,
        |       STRING_AGG(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
        |       MAX(CAST(EXTRACT(year FROM DATE '2000-06-15') - EXTRACT(year FROM o_orderdate) AS INT)) AS max_years_ago
        |FROM orders
        |WHERE CAST(EXTRACT(dow FROM o_orderdate) AS INT) = 1
        |GROUP BY month
        |ORDER BY month""".stripMargin) { (s, d) =>
      org.apache.spark.sql.graft.DialectFunctions.register(s)
      Tables.orders(s, d).createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT sf_to_char(o_orderdate, 'YYYY-MM') AS month,
          |       COUNT(*) AS n_orders,
          |       sf_listagg_distinct(o_orderpriority, '|') AS priorities,
          |       MAX(sf_datediff_years(o_orderdate, DATE '2000-06-15')) AS max_years_ago
          |FROM graft_orders
          |WHERE sf_dayofweek(o_orderdate) = 1
          |GROUP BY month
          |ORDER BY month""".stripMargin)
    }
  )
}
