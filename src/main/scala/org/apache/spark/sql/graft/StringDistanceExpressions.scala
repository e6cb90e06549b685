/** Native Catalyst string-distance extensions. Same packaging rationale as
  * [[VectorExpressions]]: the Expression→Column bridge is `private[sql]`.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance between two strings — the
  * edit-distance family member Spark lacks (built-in `levenshtein` has no
  * transposition move), needed for typo-class fuzzy matching where a swap
  * of adjacent characters must cost 1, not 2.
  *
  * Extension-tier (b) of the build plan: a scalar function composable into
  * any plan, codegen'd so it stays inside whole-stage codegen (the
  * generated code calls the static kernel
  * [[graft.functions.StringDistanceKernel]] — the same shape as Spark's own
  * `levenshtein`, whose codegen calls `UTF8String.levenshteinDistance`;
  * inlining an O(n·m) DP into janino source would only bloat the method).
  *
  * NULL-safe: NULL if either side is NULL (BinaryExpression default).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringDistanceKernel.damerauLevenshtein(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistanceKernel.damerauLevenshtein($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object StringDistanceFunctions {
  /** Column-level entry point: `damerauLevenshtein($"a", $"b")`. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    ExpressionUtils.column(DamerauLevenshtein(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
