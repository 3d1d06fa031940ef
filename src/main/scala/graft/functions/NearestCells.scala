package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native IVF cell assignment — the `nProbe` nearest coarse-quantizer
  * cells for a vector column, nearest first (squared L2, ties to the
  * lower cell id). Third promoted §4 fast path.
  *
  * The Column-composition form this replaces (round-4 `Ivf.cellOf`)
  * embedded every centroid as `array(lit…)` PLAN LITERALS and
  * evaluated nCells interpreted zip_with/aggregate lambdas per row —
  * a plan tree of O(nCells·dim) literal nodes and an
  * interpreter-bound scan. At the scaladoc's own sizing (nCells ≈
  * √corpus: 10⁴ cells × 768 dims) that is a multi-million-node plan.
  * Here the centroid matrix rides a TorrentBroadcast (shipped to each
  * executor once, NOT per task and never inside the plan), and the
  * distance scan is one fused loop called from whole-stage codegen —
  * the same recipe as [[CosineSimilarity]], plus a broadcast for the
  * model state.
  *
  * Semantics match the replaced form exactly: distances accumulate
  * left-to-right in double over `min(|vec|, dim)` components, ties
  * order by ascending cell id, null vector ⇒ null. Not registered as
  * a SQL function — the broadcast handle has no literal form; build
  * it through `Ivf.cellsOf`.
  */
case class NearestCells(
    left: Expression, right: Expression,
    bc: Broadcast[NearestCells.Centroids]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cells expects ARRAY<FLOAT|DOUBLE>, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("nearest_cells nProbe must be an INT literal")
    else right.eval() match {
      case null => TypeCheckResult.TypeCheckFailure("nProbe must not be NULL")
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case n => TypeCheckResult.TypeCheckFailure(s"nProbe must be >= 1, got $n")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(vec: Any, nProbe: Any): Any = {
    val arr = vec.asInstanceOf[ArrayData]
    val n = nProbe.asInstanceOf[Number].intValue()
    if (isFloat) NearestCells.compute(arr.toFloatArray(), bc.value, n)
    else NearestCells.compute(arr.toDoubleArray(), bc.value, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, n) => {
      val centClass = classOf[NearestCells.Centroids].getName
      val bcClass = classOf[Broadcast[_]].getName
      val bcRef = ctx.addReferenceObj("centroidsBc", bc, bcClass)
      // broadcast dereferenced ONCE per task (operator init), not per row
      val cents = ctx.addMutableState(centClass, "cents",
        v => s"$v = ($centClass) ($bcRef).value();")
      val toArr = if (isFloat) "toFloatArray" else "toDoubleArray"
      s"${ev.value} = graft.functions.NearestCells.compute($vec.$toArr(), $cents, $n);"
    })
}

object NearestCells {

  /** Executor-resident quantizer state: `ids(i)` is the cell id of
    * row i of the dense centroid matrix; rows ordered by ascending
    * cell id so iteration order IS the tie-break order.
    */
  final case class Centroids(ids: Array[Int], mat: Array[Array[Double]])
      extends Serializable {
    require(mat.length == ids.length && mat.nonEmpty)
  }

  /** Insert (d, ci) into the sorted top-n buffers; strict `<` keeps
    * the earlier (lower-id) cell on distance ties.
    */
  private def insert(bestD: Array[Double], bestI: Array[Int], d: Double, ci: Int): Unit = {
    val m = bestD.length
    if (d < bestD(m - 1)) {
      var j = m - 1
      while (j > 0 && d < bestD(j - 1)) {
        bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
      }
      bestD(j) = d; bestI(j) = ci
    }
  }

  /** Only slots that actually received a finite distance count — a
    * NaN/overflow-Inf distance never passes the strict `<`, so a
    * fully-corrupt vector (all-NaN distances) yields an EMPTY array
    * (the row drops out of any explode-based assignment) instead of
    * nProbe bogus copies of cell 0.
    */
  private def result(c: Centroids, bestD: Array[Double], bestI: Array[Int]): ArrayData = {
    var filled = 0
    while (filled < bestD.length && bestD(filled) < Double.PositiveInfinity) filled += 1
    val out = new Array[Int](filled)
    var i = 0
    while (i < filled) { out(i) = c.ids(bestI(i)); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Static-forwarded so generated Java calls it directly. */
  def compute(q: Array[Float], c: Centroids, nProbe: Int): ArrayData = {
    val m = math.min(nProbe, c.mat.length)
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestI = new Array[Int](m)
    var ci = 0
    while (ci < c.mat.length) {
      val cent = c.mat(ci)
      val n = math.min(q.length, cent.length)
      var d = 0.0; var i = 0
      while (i < n) { val t = q(i).toDouble - cent(i); d += t * t; i += 1 }
      insert(bestD, bestI, d, ci)
      ci += 1
    }
    result(c, bestD, bestI)
  }

  def compute(q: Array[Double], c: Centroids, nProbe: Int): ArrayData = {
    val m = math.min(nProbe, c.mat.length)
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestI = new Array[Int](m)
    var ci = 0
    while (ci < c.mat.length) {
      val cent = c.mat(ci)
      val n = math.min(q.length, cent.length)
      var d = 0.0; var i = 0
      while (i < n) { val t = q(i) - cent(i); d += t * t; i += 1 }
      insert(bestD, bestI, d, ci)
      ci += 1
    }
    result(c, bestD, bestI)
  }
}
