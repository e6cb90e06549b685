/** Native Catalyst expressions for the sketch family's hash derivations.
  * Same placement rationale as [[VectorExpressions]]: the
  * Expression→Column bridge is `private[sql]`.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Thread-confined MD5 digest + big-endian fold of the first 8 bytes.
  * Static forwarders make `Md5Util.hi64(...)` callable from generated Java.
  */
object Md5Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hi64(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }

  def hi64(s: UTF8String): Long = hi64(s.getBytes)
}

/** The first 64 bits of `md5(input)` as one BIGINT (big-endian, so hex
  * prefixes of the digest are unsigned right shifts of this value):
  *
  *   - `CAST(conv(substr(md5(x),1,2),16,10) AS BIGINT)` ≡ `hi64 >>> 56`
  *   - `... substr(md5(x),1,4)  ...`                    ≡ `hi64 >>> 48`
  *   - `... substr(md5(x),1,8)  ...`                    ≡ `hi64 >>> 32`
  *   - `... substr(md5(x),1,12) ...`                    ≡ `hi64 >>> 16`
  *   - `... substr(md5(x),3,8)  ...`                    ≡ `(hi64 >>> 24) & 0xFFFFFFFF`
  *
  * Why native: that md5→hex→substr→conv chain is the suite's most
  * interpreted-mode-sensitive generated code — when the codegen class
  * cache thrashes, the hex round-trip (32-char UTF8String materialization
  * + per-char base-16 parse, twice per row) ran at 15× the CPU
  * (BASELINE.md, q_distinct_hll 18 vs 290 process-CPU-s on the same
  * plan). This expression is one digest call + one 8-byte fold in BOTH
  * compiled and interpreted modes, so the worst case is bounded by
  * construction; the residual shifts/masks are trivial either way.
  * Equivalence to the hex chain is property-tested in SketchExprSpec, and
  * the DuckDB oracles keep the hex formulation — hash-identical results
  * prove the rewrite at every gate.
  *
  * String inputs digest their UTF-8 bytes — identical to
  * `md5(CAST(s AS BINARY))`.
  */
case class Md5Hi64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, BinaryType))
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hi64"

  private def isString: Boolean = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString) Md5Util.hi64(input.asInstanceOf[UTF8String])
    else Md5Util.hi64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.Md5Util.hi64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hi64 =
    copy(child = newChild)
}

/** HLL rank-of-first-one over a 32-bit hash value stored in a BIGINT:
  * `IF(hv = 0, 33, 33 - length(bin(hv)))` without the binary-string
  * round-trip — `length(bin(hv))` is `64 - numberOfLeadingZeros(hv)` for
  * `hv > 0`, so rho is `nlz(hv) - 31`. Bit-identical to the SQL
  * formulation for all hv in [0, 2^32) (SketchExprSpec sweeps the
  * boundary powers of two).
  */
case class Rho32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hll_rho32"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v == 0L) 33 else java.lang.Long.numberOfLeadingZeros(v) - 31
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"($c == 0L) ? 33 : (java.lang.Long.numberOfLeadingZeros($c) - 31)")

  override protected def withNewChildInternal(newChild: Expression): Rho32 =
    copy(child = newChild)
}

object SketchExpressions {
  /** First 64 digest bits as BIGINT (see [[Md5Hi64]]). */
  def md5Hi64(c: Column): Column =
    ExpressionUtils.column(Md5Hi64(ExpressionUtils.expression(c)))

  /** HLL rho over a 32-bit hash in a BIGINT (see [[Rho32]]). */
  def hllRho32(c: Column): Column =
    ExpressionUtils.column(Rho32(ExpressionUtils.expression(c)))
}
