package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `ARRAY<BIGINT>` columns — the
  * fourth promoted §4 fast path. The Column form it replaces
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) evaluates its lambdas
  * interpreted per row, and it sits on the hottest scan in the
  * engine: every exact-KNN ranking (brute force, blocked, batched,
  * RRF's vector arm) scores the whole corpus with it. This is one
  * fused loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF form: null if either side is
  * null, product-sum over the shorter length, 64-bit wrap-around on
  * overflow (Java long arithmetic — the same wrap the lambda does),
  * so every integer-dot oracle is bit-for-bit unchanged.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData].toLongArray()
    val xb = b.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(xa.length, xb.length)
    var dot = 0L; var i = 0
    while (i < n) { dot += xa(i) * xb(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      s"""
         |long[] $xa = $a.toLongArray();
         |long[] $xb = $b.toLongArray();
         |int $n = Math.min($xa.length, $xb.length);
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $xa[$i] * $xb[$i];
         |}
       """.stripMargin
    })
}
