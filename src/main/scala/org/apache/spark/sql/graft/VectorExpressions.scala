/** Native Catalyst extensions for graft. Lives under org.apache.spark.sql
  * because the Expression→Column bridge (`classic.ExpressionUtils`) and
  * `AbstractDataType` are `private[sql]` — the documented pattern for
  * libraries shipping custom codegen'd expressions.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the hot loop of similarity search: the
  * numeric-vector dot product over `array<float>` / `array<double>`,
  * promoted to double per element and summed sequentially (same arithmetic
  * as `aggregate(zip_with(...))`, so results are bit-identical to the
  * declarative formulation — but much faster, because `doGenCode` emits a
  * primitive `for` loop over the packed ArrayData instead of interpreting
  * two lambda closures per element with boxed accumulators).
  *
  * This is the (b)-tier extension point of the build plan (custom
  * `Expression` where built-ins can't express the performance, SURVEY §7.3):
  * the SEMANTICS are expressible with higher-order functions; the inner-loop
  * cost at 100 TB is not.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // def, not val: the expression is captured by serialized tasks and
  // TypeCollection is not Serializable
  override def inputTypes: Seq[AbstractDataType] = {
    val floatOrDoubleArray = TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
    Seq(floatOrDoubleArray, floatOrDoubleArray)
  }

  override def dataType: DataType = DoubleType

  // NULL is produced not only for NULL inputs but also for length-mismatched
  // arrays and NULL elements (matching zip_with's padding semantics), so the
  // result is nullable regardless of the children.
  override def nullable: Boolean = true

  override def prettyName: String = "float_vector_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter array with NULL and NULL*v = NULL, so the
    // HOF formulation yields NULL for mismatched lengths / NULL elements —
    // mirror that exactly rather than silently truncating (a dimension
    // mismatch must never read as a plausible similarity score).
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ok = ctx.freshName("ok")
      val getX = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  boolean $ok = true;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $ok = false; break; }
         |    $s += $getX * $getY;
         |  }
         |  if ($ok) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API over the native expression. */
  def fastDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** A literal float vector (e.g. an LSH hyperplane) as a Column. */
  def litFloatArray(values: Array[Float]): Column =
    ExpressionUtils.column(Literal.create(values, ArrayType(FloatType)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private val dotDescription = (
    FunctionIdentifier("float_vector_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getCanonicalName, "float_vector_dot"),
    (children: Seq[Expression]) => FloatVectorDot(children.head, children(1)))

  /** Register the native functions on an existing session so `spark.sql`
    * users can call them: `SELECT float_vector_dot(a, b)`.
    */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = dotDescription
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** For `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
    * — injects the native functions into every new session at build time.
    */
  private[graft] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(dotDescription)
}

/** Session-extensions entry point (SURVEY §7.3 tier (c) registration):
  * native expressions + the SQL dialect shims.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    VectorExpressions.inject(ext)
    DialectFunctions.inject(ext)
  }
}
