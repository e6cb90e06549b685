/** Native Catalyst extensions for graft. Lives under org.apache.spark.sql
  * because the Expression→Column bridge (`classic.ExpressionUtils`) and
  * `AbstractDataType` are `private[sql]` — the documented pattern for
  * libraries shipping custom codegen'd expressions.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal, UnaryExpression, UnsafeArrayData}
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

/** All RP-LSH band keys of a float vector in ONE expression: band `b`'s key
  * packs the sign bits of hyperplane projections `b*bits .. b*bits+bits-1`
  * (bit j = ⟨v, plane⟩ > 0), output `array<int>` indexed by band id
  * (consume with `posexplode`).
  *
  * Why not compose `bands × bits` [[FloatVectorDot]] columns (the original
  * formulation)? Because adaptive banding grows the plane count with the
  * corpus — at ×10 scale (8 bits × 30 bands = 240 inlined dot loops) the
  * generated `doConsume` crossed janino's 64 KB method limit and Spark
  * dropped the WHOLE banding stage out of compiled execution ("Code grows
  * beyond 64 KB" → interpreted fallback), exactly at the scale the stage
  * matters. This expression's generated code is a fixed-size triple loop
  * over a referenced `float[][]` — constant code size at ANY (bands, bits),
  * one null-scan and one float→double conversion of the input vector
  * instead of one per plane. Arithmetic is bit-identical to the
  * FloatVectorDot formulation: float→double promotion per element,
  * sequential sum, strict `> 0` sign test.
  *
  * NULL for a NULL vector, a NULL element, or a plane/vector dimension
  * mismatch (same refuse-don't-truncate stance as FloatVectorDot).
  */
case class RpBandKeys(child: Expression, planes: Array[Array[Float]],
    bands: Int, bits: Int) extends UnaryExpression with ExpectsInputTypes {

  require(bands > 0 && bits > 0 && bits < 32 && bands.toLong * bits <= planes.length,
    s"RpBandKeys($bands,$bits): need bands*bits <= ${planes.length} planes and bits < 32")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_band_keys"

  private def dim: Int = planes(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim) return null
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vec(i) = v.getFloat(i).toDouble
      i += 1
    }
    val keys = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var key = 0
      var j = 0
      while (j < bits) {
        val p = planes(b * bits + j)
        var s = 0.0
        var k = 0
        while (k < n) { s += vec(k) * p(k); k += 1 }
        if (s > 0) key |= 1 << j
        j += 1
      }
      keys(b) = key
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val vec = ctx.freshName("vec")
      val keys = ctx.freshName("keys")
      val key = ctx.freshName("key")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |int $n = $v.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $ok = true;
         |  double[] $vec = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |    $vec[$i] = (double) $v.getFloat($i);
         |  }
         |  if (!$ok) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $keys = new int[$bands];
         |    for (int $b = 0; $b < $bands; $b++) {
         |      int $key = 0;
         |      for (int $j = 0; $j < $bits; $j++) {
         |        float[] $p = $planesRef[$b * $bits + $j];
         |        double $s = 0.0;
         |        for (int $k = 0; $k < $n; $k++) { $s += $vec[$k] * (double) $p[$k]; }
         |        if ($s > 0) { $key |= 1 << $j; }
         |      }
         |      $keys[$b] = $key;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RpBandKeys =
    copy(child = newChild)

  // The case-class-generated equals/hashCode would compare the
  // `Array[Array[Float]]` plane pool by REFERENCE, so two semantically
  // identical expressions built from separately-allocated (but equal) pools
  // would never canonicalize together (no subexpression dedup). In practice
  // the pool is a per-(dim,seed) shared singleton, but that is an
  // optimization, not an invariant — compare by CONTENT, with a cached
  // content hash so the deep scan runs once per instance.
  private lazy val planesHash: Int = {
    var h = 17
    var i = 0
    while (i < planes.length) { h = h * 31 + java.util.Arrays.hashCode(planes(i)); i += 1 }
    h
  }
  override def hashCode(): Int =
    ((child.hashCode * 31 + bands) * 31 + bits) * 31 + planesHash
  override def equals(other: Any): Boolean = other match {
    case r: RpBandKeys => (r eq this) ||
      (child == r.child && bands == r.bands && bits == r.bits &&
        (planes.eq(r.planes) ||
          java.util.Arrays.deepEquals(
            planes.asInstanceOf[Array[AnyRef]], r.planes.asInstanceOf[Array[AnyRef]])))
    case _ => false
  }
}

object VectorExpressions {
  /** Column API over the native expression. */
  def fastDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** All LSH band keys in one pass (see [[RpBandKeys]]); `array<int>`
    * indexed by band id — consume with `posexplode`.
    */
  def rpBandKeys(v: Column, planes: Array[Array[Float]],
      bands: Int, bits: Int): Column =
    ExpressionUtils.column(RpBandKeys(
      ExpressionUtils.expression(v), planes, bands, bits))

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
