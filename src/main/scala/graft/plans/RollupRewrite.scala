package graft.plans

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, Expression, IsNotNull, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
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

  /** An aggregate over base ⋈ dim (on the dim's unique key) served from
    * rollup ⋈ dim. The registration captures the canonical user shape's
    * optimized signature (grouping, aggregates, join condition, relation
    * suffixes) and a replacement builder; soundness rests on (a) the exact
    * signature match against the canonical, and (b) the algebraic identity
    * the property spec + DuckDB oracle prove on data: with the fk in the
    * rollup grain and a unique dim key, the N:1 join commutes with partial
    * aggregation, and the outer aggregate re-merges partials (COUNT(*) →
    * SUM(n), SUM(x) → SUM(sum_x)).
    */
  final case class JoinSpec(
      basePathSuffix: String,
      dimPathSuffix: String,
      rollupPath: String,
      groupSig: Seq[String],
      aggSig: Seq[(String, String)],
      joinCondSig: String,
      replacement: SparkSession => org.apache.spark.sql.DataFrame)

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()
  private val joinSpecs = new java.util.concurrent.ConcurrentHashMap[String, JoinSpec]()
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

  final case class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (suspended.get() || (specs.isEmpty && joinSpecs.isEmpty)) plan
      else plan.transformUp {
        case agg: Aggregate =>
          tryRewrite(agg).orElse(tryRewriteJoin(agg)).getOrElse(agg)
      }

    /** Aggregate over base ⋈ dim matching a registered [[JoinSpec]]'s exact
      * canonical signature → the registered replacement (rollup ⋈ dim with
      * merged partials), with the original output attributes re-aliased on
      * top so parents are untouched. Shape required: INNER equi-join with
      * the registered condition, base on the left, dim on the right (each
      * optionally under a column-pruning Project), nothing else between
      * scan and aggregate — any filter or extra operator blocks it, with
      * ONE sound exception: `IsNotNull` guards on the join keys, which the
      * optimizer infers from the inner join itself
      * (InferFiltersFromConstraints) — rows they remove can never survive
      * the join, so stripping them for the match loses nothing.
      */
    private def stripJoinKeyNullGuards(plan: LogicalPlan, condRefs: AttributeSet): LogicalPlan =
      plan match {
        case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
          stripJoinKeyNullGuards(child, condRefs)
        case Filter(c, child) if splitConjunctivePredicates(c).forall {
              case IsNotNull(a: AttributeReference) => condRefs.contains(a)
              case _ => false
            } =>
          stripJoinKeyNullGuards(child, condRefs)
        case other => other
      }

    private def tryRewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
      val joined = agg.child match {
        case j: Join => Some(j)
        case Project(pl, j: Join)
            if pl.forall(_.isInstanceOf[AttributeReference]) => Some(j)
        case _ => None
      }
      joined.flatMap {
        case j @ Join(left, right, Inner, Some(cond), _) =>
          import scala.jdk.CollectionConverters._
          joinSpecs.values.asScala.find { s =>
            baseRelation(stripJoinKeyNullGuards(left, cond.references), s.basePathSuffix).isDefined &&
              baseRelation(stripJoinKeyNullGuards(right, cond.references), s.dimPathSuffix).isDefined &&
              sig(cond) == s.joinCondSig && {
                val (g, a) = signatureOf(agg)
                g == s.groupSig && a == s.aggSig
              }
          }.flatMap { s =>
            suspended.set(true)
            val repl =
              try s.replacement(spark).queryExecution.optimizedPlan
              finally suspended.set(false)
            val byName = repl.output.map(a => a.name -> a).toMap
            if (!agg.output.forall(o => byName.contains(o.name))) None
            else Some(Project(
              agg.output.map { o =>
                Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
              }, repl))
          }
        case _ => None
      }
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
      // a GLOBAL aggregate (no grouping) does not commute with ANY filter:
      // agg(σ(base)) yields one row (e.g. COUNT=0) where σ(rollup) yields
      // zero — so a filter-commuted rewrite requires a non-empty grain
      val filterSound = cond.forall(c => c.deterministic &&
        agg.groupingExpressions.nonEmpty &&
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
      // Key by the full matched signature, not just the base table: two
      // rollups with different grouping/aggregate shapes over the same base
      // must coexist (each serves its own query shape). But a
      // RE-materialization of the SAME rollupPath with a different
      // canonical must evict any prior spec over that path — the overwrite
      // replaced the parquet, so the old signature would otherwise keep
      // matching its shape and silently serve the NEW path's data.
      specs.entrySet().removeIf(e => e.getValue.rollupPath == rollupPath)
      specs.put(s"$basePathSuffix|${g.mkString(",")}|${a.map { case (n, e) => s"$n=$e" }.mkString(",")}",
        Spec(basePathSuffix, rollupPath, g, a))
    } finally suspended.set(false)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRule(spark)
  }

  /** Maintain + register a JOIN-serving rollup: `canonicalUser` is the
    * exact aggregate-over-base⋈dim shape to serve; `rollup` is the partial
    * aggregate over the base (fk in its grain), materialized to
    * `rollupPath`; `replacement` rebuilds the served plan from the rollup
    * parquet. The canonical's own optimized plan supplies every signature
    * the matcher compares against — same machinery, nothing hand-written.
    */
  def materializeAndRegisterJoin(
      spark: SparkSession,
      canonicalUser: org.apache.spark.sql.DataFrame,
      rollup: org.apache.spark.sql.DataFrame,
      basePathSuffix: String,
      dimPathSuffix: String,
      rollupPath: String,
      replacement: SparkSession => org.apache.spark.sql.DataFrame): Unit = {
    suspended.set(true)
    try {
      rollup.write.mode("overwrite").parquet(rollupPath)
      val optimized = canonicalUser.queryExecution.optimizedPlan
      val agg = optimized.collectFirst { case a: Aggregate => a }.getOrElse(
        throw new IllegalArgumentException(
          s"canonical join query did not optimize to an Aggregate:\n$optimized"))
      val cond = optimized.collectFirst {
        case Join(_, _, Inner, Some(c), _) => c
      }.getOrElse(throw new IllegalArgumentException(
        s"canonical join query did not optimize to an inner equi-join:\n$optimized"))
      val (g, a) = signatureOf(agg)
      // Full-signature key: a second join rollup over the same base/dim pair
      // with a different grouping/aggregate shape (or join condition) must
      // not overwrite the first — each shape keeps its own registration.
      // (Same stale-path eviction as the base registry: the parquet at
      // rollupPath was just overwritten, so any prior spec over it is gone.)
      joinSpecs.entrySet().removeIf(e => e.getValue.rollupPath == rollupPath)
      joinSpecs.put(
        s"$basePathSuffix|$dimPathSuffix|${g.mkString(",")}|${a.map { case (n, e) => s"$n=$e" }.mkString(",")}|${sig(cond)}",
        JoinSpec(basePathSuffix, dimPathSuffix, rollupPath, g, a, sig(cond), replacement))
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
      // sf-qualified suffix: a spec registered for one testdata scale can
      // never match (and mis-serve) another scale's scan in the same JVM
      materializeAndRegister(s, dailyOrders(s, d), s"$d/orders.parquet", rollupPath)
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
      // sf-qualified suffix: a spec registered for one testdata scale can
      // never match (and mis-serve) another scale's scan in the same JVM
      materializeAndRegister(s, dailyOrders(s, d), s"$d/orders.parquet", rollupPath)
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr(centsSql)).as("sum_cents"))
        .orderBy("o_orderdate")
    },

    // the reference's other dashboard shape: an aggregate over a FACT ⋈
    // DIM broadcast join (sql/4.analytics_queries.sql:198-199,229-230
    // groups visit revenue by doctor/department the same way). The rollup
    // pre-aggregates the FACT at (fk) grain — 100× fewer rows than the
    // base at warehouse scale — and the serving plan joins THOSE partials
    // to the broadcast dim and re-merges (COUNT(*)→SUM(n), SUM→SUM(sum)).
    // The user query stays written against base ⋈ dim; the oracle
    // aggregates base ⋈ dim in DuckDB; PlanAuditSpec proves the executed
    // plan scans the rollup, never the base, and broadcasts the dim.
    QueryDef(
      "q_rollup_serve_join",
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      serveJoinSetup(s, d)
      // the USER query — written against base ⋈ dim
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr(centsSql)).as("sum_cents"))
        .orderBy("c_mktsegment")
    }
  )

  /** Materialize + register the per-customer order rollup serving the
    * q_rollup_serve_join shape (shared with PlanAuditSpec / the property
    * spec's negative cases).
    */
  def serveJoinSetup(s: SparkSession, d: String): String = {
    val rollupPath = "target/rollup_store/orders_by_cust_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    val canonical = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr(centsSql)).as("sum_cents"))
    val rollup = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(expr(centsSql)).as("cents"))
    materializeAndRegisterJoin(s, canonical, rollup,
      s"$d/orders.parquet", s"$d/customer.parquet", rollupPath,
      sess => sess.read.parquet(rollupPath)
        .join(broadcast(Tables.customer(sess, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n")).cast("long").as("n_orders"),
          sum(col("cents")).cast("long").as("sum_cents")))
    rollupPath
  }
}
