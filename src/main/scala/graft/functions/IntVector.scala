package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native 1e7-scaling of a float/double vector to exact longs — the
  * fifth promoted §4 fast path, feeding [[IntDot]]. The Column form it
  * replaces (`transform(v, x => round(x * 1e7).cast(LongType))`)
  * evaluates its lambda interpreted per ELEMENT, and it sits directly
  * on the KNN scan path: every brute-force / IVF / quantized re-rank
  * projection runs it over the whole corpus before `int_dot` scores it
  * (the round-7 closing bench flagged v1/v2 on exactly this
  * projection). One fused loop inside whole-stage codegen instead.
  *
  * Semantics are IDENTICAL to the HOF form on finite inputs, element
  * for element: widen to double, multiply by 1e7, `round(…)` =
  * HALF_UP via `BigDecimal.valueOf` (the same arithmetic Spark's
  * `Round` performs on doubles), then the double→long cast. Null
  * vector ⇒ null; null elements map to null elements. The one
  * deliberate divergence: where Spark 4's default-ANSI cast THROWS on
  * NaN/±Inf/overflow, this keeps the non-ANSI saturation (NaN → 0,
  * overflow → Long.{Max,Min}Value) so one corrupt vector degrades
  * deterministically instead of failing a 100-TB scan. Every
  * integer-dot oracle is bit-for-bit unchanged (IntVectorExprSpec
  * pins equivalence on the edge cases).
  */
case class IntVector(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int_vector expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "int_vector"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildInternal(newChild: Expression): IntVector =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    IntVector.compute(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IntVector.compute($v, $isFloat);")
}

object IntVector {

  /** One element: the exact arithmetic of `round(x * 1e7).cast(LONG)`.
    * Spark's Round on doubles is `BigDecimal.valueOf(y).setScale(0,
    * HALF_UP)` with NaN/Inf short-circuited; the long cast then
    * truncates (NaN → 0, ±Inf saturate) — replicated literally so the
    * native path is bit-identical to the HOF it replaces.
    */
  def scaleOne(x: Double): Long = {
    val y = x * 1e7
    if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y)) y.toLong
    else java.math.BigDecimal.valueOf(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Static-forwarded so generated Java calls it directly. The null
    * probe costs one boolean pass; embeddings are dense in practice so
    * the primitive (UnsafeArrayData) path is the one taken.
    */
  def compute(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (arr.isNullAt(i)) hasNull = true else i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      var j = 0
      while (j < n) {
        out(j) = scaleOne(if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j))
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j))
          out(j) = scaleOne(if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
