package graft.plans

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Transparent materialized-rollup query rewrite — the serving half of the
  * warehouse's aggregate-acceleration story (Snowflake materialized views /
  * BigQuery BI Engine class; [[graft.operators.IncrementalRollup]] is the
  * maintenance half). A query WRITTEN AGAINST THE BASE TABLE whose
  * aggregate signature matches a registered rollup is rewritten by a
  * Catalyst optimizer [[Rule]] to read the rollup instead: at 100 TB the
  * dashboard aggregate becomes a scan of a few thousand pre-aggregated
  * rows, and the user never changes their SQL.
  *
  * Soundness contract (deliberately narrow — a rewrite that fires on a
  * query it cannot prove equivalent is a correctness bug, not a feature):
  *  - the candidate must be an [[Aggregate]] directly over the registered
  *    base relation (optionally through the column-pruning [[Project]]);
  *    any filter, join, or expression between scan and aggregate blocks
  *    the rewrite;
  *  - grouping AND aggregate expressions must match the registered
  *    signature EXACTLY — compared as name-qualified SQL renderings of the
  *    OPTIMIZED expressions (both sides go through the same optimizer, so
  *    cast normalization/constant folding cannot desync them), plus the
  *    output alias names;
  *  - the registration captures the signature by optimizing the canonical
  *    aggregate itself (with the rule suspended), so the matcher is
  *    derived from the same machinery it matches against — no hand-written
  *    expression patterns to drift.
  *
  * The rewritten plan preserves the original output attributes
  * (name/type/exprId) via aliases onto the rollup scan, so parent
  * operators (sorts, projects) are untouched. The driver-gated query
  * below maintains the rollup (full overwrite — the incremental path is
  * IncrementalRollup's concern), registers it, and then runs the BASE
  * query; its DuckDB oracle aggregates the base table directly, so the
  * hash gate proves the rewrite is result-identical, and PlanAuditSpec
  * proves the base parquet is never scanned.
  */
object RollupRewrite {

  final case class Spec(
      basePathSuffix: String,
      rollupPath: String,
      groupSig: Seq[String],
      aggSig: Seq[(String, String)]) // (alias name, child expression SQL)

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()
  private val suspended = new ThreadLocal[Boolean] { override def initialValue = false }

  /** Name-stable rendering of an optimized expression (exprIds do not
    * appear in `.sql`, so two plans over the same relation render equal).
    */
  private def sig(e: org.apache.spark.sql.catalyst.expressions.Expression): String = e.sql

  private def baseRelation(plan: LogicalPlan, suffix: String): Option[LogicalRelation] = {
    val stripped = plan match {
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) => child
      case other => other
    }
    stripped match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.rootPaths.exists(_.toString.endsWith(suffix)) => Some(lr)
      case _ => None
    }
  }

  private def signatureOf(agg: Aggregate): (Seq[String], Seq[(String, String)]) = {
    val groups = agg.groupingExpressions.map(sig)
    val aggs = agg.aggregateExpressions.collect {
      case a: Alias => (a.name, sig(a.child))
      case ar: AttributeReference => (ar.name, sig(ar))
    }
    (groups, aggs)
  }

  final case class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (suspended.get() || specs.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }

    /** A grain-level filter — deterministic, referencing ONLY bare grouping
      * columns — commutes with the aggregate (`agg(σ_g(base)) =
      * σ_g(agg(base))`), so the dashboard's date-range shape
      * (`WHERE o_orderdate BETWEEN …` over the daily rollup grain) serves
      * from the rollup with the filter re-applied above the rollup scan
      * (where it then pushes into the rollup's parquet scan as usual). Any
      * predicate touching a non-grouping column still blocks the rewrite:
      * it would have filtered rows WITHIN a group, which the
      * pre-aggregated rollup can no longer distinguish.
      */
    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val (cond, scanChild) = agg.child match {
        case Filter(c, child) => (Some(c), child)
        case Project(pl, Filter(c, child))
            if pl.forall(_.isInstanceOf[AttributeReference]) => (Some(c), child)
        case other => (None, other)
      }
      val groupAttrs = agg.groupingExpressions.collect { case a: AttributeReference => a }
      val filterSound = cond.forall(c => c.deterministic &&
        c.references.forall(r => groupAttrs.exists(_.exprId == r.exprId)))
      if (!filterSound) return None
      val spec = {
        import scala.jdk.CollectionConverters._
        specs.values.asScala.find { s =>
          baseRelation(scanChild, s.basePathSuffix).isDefined && {
            val (g, a) = signatureOf(agg)
            g == s.groupSig && a == s.aggSig
          }
        }
      }
      spec.flatMap { s =>
        // read the rollup with the rule suspended (it could otherwise
        // recurse through this very optimization)
        suspended.set(true)
        val rollup =
          try spark.read.parquet(s.rollupPath).queryExecution.analyzed
          finally suspended.set(false)
        val byName = rollup.output.map(a => a.name -> a).toMap
        // signature match makes the name remap total in practice (the
        // grouping columns appear in the rollup under the agg's output
        // names) — but an unresolvable name means we cannot PROVE the
        // rewrite, so it must block it, never throw mid-optimizer
        val remapTotal = agg.output.forall(o => byName.contains(o.name)) &&
          cond.forall(_.references.forall(r => byName.contains(r.name)))
        if (!remapTotal) None
        else {
          val scan: LogicalPlan = cond match {
            case Some(c) =>
              val remapped = c.transform {
                case a: AttributeReference => byName(a.name)
              }
              Filter(remapped, rollup)
            case None => rollup
          }
          val projectList: Seq[NamedExpression] = agg.output.map { o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
          }
          Some(Project(projectList, scan))
        }
      }
    }
  }

  /** Maintain (full overwrite) + register the rollup for `canonical`, an
    * Aggregate DataFrame over the base table. Installs the optimizer rule
    * into the session on first use. Idempotent per (session, base path).
    */
  def materializeAndRegister(
      spark: SparkSession,
      canonical: org.apache.spark.sql.DataFrame,
      basePathSuffix: String,
      rollupPath: String): Unit = {
    suspended.set(true)
    try {
      canonical.write.mode("overwrite").parquet(rollupPath)
      val optimized = canonical.queryExecution.optimizedPlan
      val agg = optimized.collectFirst { case a: Aggregate => a }.getOrElse(
        throw new IllegalArgumentException(
          s"canonical rollup query did not optimize to an Aggregate:\n$optimized"))
      val (g, a) = signatureOf(agg)
      specs.put(basePathSuffix, Spec(basePathSuffix, rollupPath, g, a))
    } finally suspended.set(false)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRule(spark)
  }

  private def centsSql =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  private def dailyOrders(s: SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy(col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr(centsSql)).as("sum_cents"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_rollup_serve",
      s"""SELECT o_orderdate, COUNT(*) AS n_orders,
         |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM orders
         |GROUP BY o_orderdate
         |ORDER BY o_orderdate""".stripMargin) { (s, d) =>
      val rollupPath = "target/rollup_store/orders_daily_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      materializeAndRegister(s, dailyOrders(s, d), "/orders.parquet", rollupPath)
      // the USER query — written against the BASE table; the optimizer
      // serves it from the rollup (PlanAuditSpec proves the base parquet
      // is absent from the executed plan; the oracle aggregates the base
      // directly, proving result identity)
      dailyOrders(s, d).orderBy("o_orderdate")
    },

    // the reference's dashboard shape: the same aggregate UNDER a
    // date-range predicate at the rollup grain (sql/4.analytics_queries.sql
    // filters its daily aggregates exactly like this). The grain-level
    // filter commutes with the aggregate, so the rule serves it from the
    // rollup with the range re-applied above (and pushed into) the rollup
    // scan; the oracle filters and aggregates the BASE table, so the hash
    // gate proves the commuted plan result-identical.
    QueryDef(
      "q_rollup_serve_window",
      s"""SELECT o_orderdate, COUNT(*) AS n_orders,
         |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY o_orderdate
         |ORDER BY o_orderdate""".stripMargin) { (s, d) =>
      val rollupPath = "target/rollup_store/orders_daily_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      materializeAndRegister(s, dailyOrders(s, d), "/orders.parquet", rollupPath)
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr(centsSql)).as("sum_cents"))
        .orderBy("o_orderdate")
    }
  )
}
