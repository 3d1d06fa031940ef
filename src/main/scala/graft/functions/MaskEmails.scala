package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the structure-preserving email mask
  * (reference guardrails.py:200-237 via Guardrails.maskEmail) — the
  * engine's LAST remaining UDF promoted to codegen, making the hot
  * surface zero-UDF.
  *
  * Semantics are IDENTICAL to `Guardrails.maskText` (and the e1
  * DuckDB oracle): every match of the reference email pattern
  * (guardrails.py:93-95, including its literal `|` inside the TLD
  * class) is rewritten in place — username keeps first and last char
  * (≤2 chars ⇒ fully masked), each dot-separated domain part keeps
  * its first char (≤1 char parts unchanged).
  *
  * Why an expression instead of the UDF: a UDF is an opaque black box
  * to Catalyst — it breaks whole-stage codegen at its projection,
  * forces row-at-a-time Scala round-trips, and blocks filter
  * reordering past it. This expression participates in codegen (one
  * static call on the UTF8String, same shape as [[SimHashSig]]), so a
  * 100-TB scrub pass stays inside the generated loop.
  */
case class MaskEmails(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mask_emails expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "mask_emails"

  override protected def withNewChildInternal(newChild: Expression): MaskEmails =
    copy(child = newChild)

  override def nullSafeEval(text: Any): Any =
    MaskEmails.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.MaskEmails.compute($t)")
}

object MaskEmails {

  /** The reference email pattern (guardrails.py:93-95), compiled once.
    * Matching over the decoded String: the pattern's classes are all
    * ASCII, but surrounding text may be any UTF-8 — offsets below are
    * char offsets into the decoded form, re-encoded at the end.
    */
  private val EmailPattern = java.util.regex.Pattern.compile(
    """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""")

  /** Static-forwarded worker the generated Java calls directly.
    * One pass: find each match, append the gap then the masked email
    * into a single builder — no quoteReplacement round-trip.
    */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val m = EmailPattern.matcher(s)
    if (!m.find()) return text // common case: no email — zero copy
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      appendMasked(sb, s, m.start(), m.end())
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  /** Mask one matched email s[from, until) into `sb`:
    * username keeps first+last char (≤2 ⇒ all '*'), each domain part
    * keeps its first char (≤1 char parts unchanged). Mirrors
    * Guardrails.maskEmail exactly.
    */
  private def appendMasked(sb: java.lang.StringBuilder, s: String,
      from: Int, until: Int): Unit = {
    val at = s.indexOf('@', from) // pattern guarantees one before `until`
    val userLen = at - from
    if (userLen <= 2) {
      var i = 0
      while (i < userLen) { sb.append('*'); i += 1 }
    } else {
      sb.append(s.charAt(from))
      var i = 0
      while (i < userLen - 2) { sb.append('*'); i += 1 }
      sb.append(s.charAt(at - 1))
    }
    sb.append('@')
    var partStart = at + 1
    var i = at + 1
    while (i <= until) {
      if (i == until || s.charAt(i) == '.') {
        val partLen = i - partStart
        if (partLen <= 1) sb.append(s, partStart, i)
        else {
          sb.append(s.charAt(partStart))
          var j = 0
          while (j < partLen - 1) { sb.append('*'); j += 1 }
        }
        if (i < until) sb.append('.')
        partStart = i + 1
      }
      i += 1
    }
  }
}
