package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression for the SimHash signature over a token
  * array — the second promoted §4 fast path (after CosineSimilarity).
  *
  * The Column-composition form (Dedup.simhash: one md5 + nBits
  * filter-lambda majority votes per row) evaluates its lambdas
  * interpreted and walks the token-hash array nBits times; this
  * expression makes ONE pass — md5 per token, all bit votes tallied
  * in the same loop — and is invoked from whole-stage codegen.
  *
  * Bit semantics are IDENTICAL to Dedup.simhash (and the d4 DuckDB
  * oracle): vote j is bit j of the md5 digest MSB-first (hex char
  * j/4, bit 3-(j%4) — i.e. byte j/8, bit 7-(j%8)); signature bit j
  * (weight 2^(nBits-1-j)) is set iff 2·ones >= nTokens, so an empty
  * token array yields the all-ones signature, exactly like the
  * composition form.
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokensOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!tokensOk)
      TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects ARRAY<STRING> tokens, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("simhash_sig nBits must be an INT literal")
    else right.eval() match {
      case null => TypeCheckResult.TypeCheckFailure("nBits must not be NULL")
      case n: Number if n.intValue() >= 1 && n.intValue() <= 64 =>
        TypeCheckResult.TypeCheckSuccess
      case n => TypeCheckResult.TypeCheckFailure(s"nBits must be in [1, 64], got $n")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(tokens: Any, bits: Any): Any =
    SimHashSig.compute(tokens.asInstanceOf[ArrayData],
      bits.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, bits) =>
      s"${ev.value} = graft.functions.SimHashSig.compute($toks, $bits);")
}

object SimHashSig {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One pass: md5 per token, tally all bit votes, majority-fold.
    * Static-forwarded so generated Java calls it directly. NULL
    * elements are skipped — the filter-lambda in the Column form
    * drops them from the vote, and `simhash_sig` is a registered SQL
    * function, so arbitrary user arrays (nulls included) reach here.
    */
  def compute(tokens: ArrayData, nBits: Int): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](nBits)
    val digest = md5.get()
    var voters = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        voters += 1
        val d = digest.digest(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < nBits) {
          votes(j) += (d(j >> 3) >> (7 - (j & 7))) & 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (2 * votes(j) >= voters) sig |= 1L << (nBits - 1 - j)
      j += 1
    }
    sig
  }
}
