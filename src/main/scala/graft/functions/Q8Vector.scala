package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType,
  FloatType}

/** Native symmetric int8 quantization of a float/double vector — the
  * index-BUILD hot path of the two-tier ANN stack (Ivf.indexQuantized
  * runs it over the whole corpus; v5/v6/v10). The Column form it
  * replaces (`transform(v, x => when(scale > 0, floor(x/scale·127))
  * .otherwise(0).cast("byte"))`) evaluates its lambda INTERPRETED per
  * ELEMENT — dims × corpus evaluations at build time (opt guide §4:
  * prefer fused codegen on scan paths; the IntVector recipe).
  *
  * Semantics are IDENTICAL to the HOF form, element for element:
  * widen to double, `floor(x / scale · 127)` exactly as Spark's
  * Floor (math.floor, LONG narrowing), then the long→byte cast —
  * values are bounded by ±127 when `scale` = max |x_i| of the same
  * row, so the cast never overflows (NaN floors to 0 the same way on
  * both paths). scale ≤ 0 (zero vectors) quantizes to 0, never NaN.
  * NULL vector or NULL scale ⇒ NULL; NULL elements map to NULL
  * elements. Q8VectorExprSpec pins equality against the HOF.
  */
case class Q8Vector(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"q8_vector expects (ARRAY<FLOAT|DOUBLE>, DOUBLE), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(ByteType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "q8_vector"

  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Q8Vector =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(v: Any, s: Any): Any =
    Q8Vector.compute(v.asInstanceOf[ArrayData],
      s.asInstanceOf[Double], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.Q8Vector.compute($v, $s, $isFloat);")
}

object Q8Vector {

  /** One element — literally the HOF's arithmetic: Spark's Floor on a
    * double is math.floor + long narrowing, and the byte cast is the
    * low-byte truncation (in-range by construction).
    */
  def quantOne(x: Double, scale: Double): Byte =
    if (scale > 0.0) math.floor(x / scale * 127.0).toLong.toByte
    else 0.toByte

  /** Static-forwarded so generated Java calls it directly; dense
    * (UnsafeArrayData) fast path like IntVector.compute.
    */
  def compute(arr: ArrayData, scale: Double, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (arr.isNullAt(i)) hasNull = true else i += 1 }
    if (!hasNull) {
      val out = new Array[Byte](n)
      var j = 0
      while (j < n) {
        out(j) = quantOne(
          if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j), scale)
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j))
          out(j) = quantOne(
            if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j), scale)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
