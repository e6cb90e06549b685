package org.apache.spark.sql.graft

import graft.functions.SnowflakeFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** SQL-text surface for the Snowflake dialect shims: each registers in the
  * session FunctionRegistry so `spark.sql` users can write the dialect
  * directly — `SELECT sf_to_char(ts, 'YYYY-MM')` — instead of transcribing
  * every reference query into the Column API.
  *
  * Builders construct the SAME Catalyst trees the Column shims in
  * [[graft.functions.SnowflakeFunctions]] compose (year(b)-year(a),
  * minute-truncated unix diffs, date_format, …), so the SQL path codegens
  * identically to the Column path — SnowflakeFunctionsSpec asserts
  * SQL-vs-Column result equality. (Builders cannot simply wrap the Column
  * compositions: a functions-API Column carries unresolved ColumnNodes,
  * which are Unevaluable when smuggled into the registry as expressions.)
  */
object DialectFunctions {

  /** Pattern/separator arguments must be foldable string literals — they
    * parameterize the expression TREE (a java.time format pattern), not row
    * values.
    */
  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v, _: StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a string literal, got $other")
  }

  /** unix seconds of the minute-truncated timestamp — the building block of
    * sfTimestampDiffMinutes (boundary-crossing semantics).
    */
  private def minuteEpoch(e: Expression): Expression =
    new UnixTimestamp(TruncTimestamp(Literal("minute"), e))

  private case class Fn(name: String, arity: Int, build: Seq[Expression] => Expression)

  private val fns: Seq[Fn] = Seq(
    // Snowflake DATEDIFF(year, a, b) = year(b) - year(a)
    Fn("sf_datediff_years", 2, c => Subtract(Year(c(1)), Year(c(0)))),
    // minute-boundary crossings, like the Column shim's (trunc diff)/60
    Fn("sf_timestampdiff_minutes", 2, c =>
      Cast(Divide(
        Cast(Subtract(minuteEpoch(c(1)), minuteEpoch(c(0))), DoubleType),
        Literal(60.0)), LongType)),
    // Snowflake DAYOFWEEK: 0=Sunday..6=Saturday
    Fn("sf_dayofweek", 1, c => Subtract(DayOfWeek(c(0)), Literal(1))),
    Fn("sf_dayname", 1, c => DateFormatClass(c(0), Literal("EEE"))),
    // TO_CHAR with the Snowflake/PostgreSQL pattern dialect
    Fn("sf_to_char", 2, c => DateFormatClass(c(0),
      Literal(SnowflakeFunctions.translateToCharPattern(strLit(c(1), "sf_to_char"))))),
    // LISTAGG(DISTINCT x, sep) WITHIN GROUP (ORDER BY x)
    Fn("sf_listagg_distinct", 2, c =>
      ArrayJoin(new ArraySort(CollectSet(c(0)).toAggregateExpression()),
        Literal(strLit(c(1), "sf_listagg_distinct")), None)),
    // x * 100.0 / NULLIF(total, 0)
    Fn("sf_pct_of", 2, c =>
      Divide(Multiply(Cast(c(0), DoubleType), Literal(100.0)),
        new NullIf(Cast(c(1), DoubleType), Literal(0.0)))))

  private def checkedBuilder(f: Fn): Seq[Expression] => Expression =
    children => {
      require(children.size == f.arity,
        s"${f.name} expects ${f.arity} arguments, got ${children.size}")
      f.build(children)
    }

  /** Register every dialect function on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit = fns.foreach { f =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(f.name),
      new ExpressionInfo(SnowflakeFunctions.getClass.getCanonicalName, f.name),
      checkedBuilder(f))
  }

  /** SparkSessionExtensions injection — see [[GraftExtensions]]. */
  private[graft] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    fns.foreach { f =>
      ext.injectFunction((FunctionIdentifier(f.name),
        new ExpressionInfo(SnowflakeFunctions.getClass.getCanonicalName, f.name),
        checkedBuilder(f)))
    }
}
