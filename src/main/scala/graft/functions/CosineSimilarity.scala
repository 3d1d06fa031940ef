package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for cosine similarity over two
  * `ARRAY<FLOAT>` columns — the SURVEY §4 candidate promoted: the
  * higher-order-function formulation (zip_with + aggregate) evaluates
  * interpreted and a Scala UDF boxes every float; this expression is
  * a single fused loop with `doGenCode`, so it lives inside
  * whole-stage codegen at scan speed. Cite: the reference scores
  * cosine inside LanceDB's native scanner
  * (generate_note_embeddings.py:61); this is the engine's equivalent
  * fast path.
  *
  * Semantics: null if either side is null; vectors compared up to the
  * shorter length; 0.0 when either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData].toFloatArray()
    val xb = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xa.length, xb.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      dot += xa(i).toDouble * xb(i); na += xa(i).toDouble * xa(i)
      nb += xb(i).toDouble * xb(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |float[] $xa = $a.toFloatArray();
         |float[] $xb = $b.toFloatArray();
         |int $n = Math.min($xa.length, $xb.length);
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $xa[$i] * $xb[$i];
         |  $na += (double) $xa[$i] * $xa[$i];
         |  $nb += (double) $xb[$i] * $xb[$i];
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / Math.sqrt($na * $nb);
       """.stripMargin
    })
}

object GraftFunctions {

  /** The engine's native function inventory — one definition feeding
    * both live-session registration and the extensions injection.
    */
  private[functions] val functions = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1)): Expression
      }),
    (FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_sig takes exactly 2 arguments")
        SimHashSig(args.head, args(1)): Expression
      }),
    (FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "int_dot takes exactly 2 arguments")
        IntDot(args.head, args(1)): Expression
      }),
    (FunctionIdentifier("int_vector"),
      new ExpressionInfo(classOf[IntVector].getName, "int_vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "int_vector takes exactly 1 argument")
        IntVector(args.head): Expression
      }))

  /** Register into a LIVE session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` registers
  * the engine's native functions at session build — the
  * SparkSessionExtensions injection path for cluster deployments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
