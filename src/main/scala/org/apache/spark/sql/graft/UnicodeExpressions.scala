/** Native Unicode-normalization extension. Same packaging rationale as
  * [[VectorExpressions]]: the Expression→Column bridge is `private[sql]`.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) — the text-normalization step every dedup/join on
  * user-supplied text needs (a decomposed "é" ≠ a precomposed "é" to every
  * byte-level operator: digest dedup, group-by, equality joins) and which
  * Spark has no built-in for. Backed by `java.text.Normalizer` (ICU-correct
  * for the canonical forms); codegen'd as a direct call so the expression
  * stays inside whole-stage codegen like [[DamerauLevenshtein]].
  *
  * The oracle counterpart is DuckDB's `nfc_normalize` (utf8proc) — both
  * implement the same Unicode canonical-composition algorithm, which is
  * what lets NFC results be hash-gated cross-engine byte-for-byte.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeFunctions {
  /** Column-level entry point: `nfcNormalize($"text")`. */
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
