package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, CaseWhen, Cast,
  Divide, Expression, Floor, LessThan, Literal, Multiply, Round,
  RuntimeReplaceable, Signum}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Cypher's `round(x[, scale])` — SCHEMA-ADAPTIVE rounding that keeps
  * the engine's displayed doubles bit-identical to the DuckDB oracle's.
  *
  * The two engines round binary doubles differently. Spark's `Round`
  * on a DOUBLE goes through `BigDecimal.valueOf(d)` — i.e. HALF_UP on
  * the SHORTEST DECIMAL STRING of the double — while DuckDB rounds the
  * BINARY value (`std::round(x * 10^s) / 10^s`, half away from zero).
  * The two agree except when the double's shortest string lands on a
  * `…5` at scale+1 digits while its binary value sits below the tie:
  * the double nearest 4201.315 is 4201.31499999999996…, which Spark
  * displays as "4201.315" and rounds to 4201.32, while DuckDB computes
  * std::round(420131.49999…) = 420131 → 4201.31. Observed on g73/g98
  * (round of an order-invariant customer-balance mean at sf0.001).
  *
  * For FLOAT/DOUBLE input at scale ≥ 0 this node replaces itself with
  * the exact DuckDB computation, in IEEE double arithmetic that the
  * JVM and C++ share operation for operation:
  *
  *   signum(x) * floor(|x| * 10^s + 0.5) / 10^s
  *
  * (std::round(v) = sign(v)·floor(|v|+0.5); |x·p| = |x|·p exactly in
  * sign-magnitude IEEE; 10^s is exact in double for s ≤ 22.) Verified
  * against DuckDB over tie, sign, zero, and large-magnitude cases.
  * Spark's `Floor(double)` narrows to LONG, so the replica is guarded
  * by `|x| < 1e15`: beyond that doubles carry no hundredths anyway and
  * the input passes through unchanged (also the NaN/±Infinity path —
  * both engines return the input there). NULL propagates through the
  * guard's else-branch.
  *
  * Every other input type (DECIMAL, integers) keeps stock `Round`,
  * which is exact HALF_UP — identical in both engines — so output
  * schemas are unchanged. Negative scales keep stock `Round` too (no
  * query domain reaches them; DuckDB switches to a division-based
  * path there that this replica does not model).
  *
  * `RuntimeReplaceable` like [[CypherDiv]]: the analyzer types this
  * node from its replacement and the optimizer swaps in stock
  * expressions, so the executed plan stays whole-stage-codegen'd.
  */
case class CypherRound(child: Expression, scale: Int)
    extends Expression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType if scale >= 0 =>
      val x: Expression =
        if (child.dataType == FloatType) Cast(child, DoubleType) else child
      val p = Literal(math.pow(10, scale))
      val replica = Multiply(Signum(x),
        Divide(Cast(Floor(Add(Multiply(Abs(x), p), Literal(0.5))),
          DoubleType), p))
      CaseWhen(Seq((LessThan(Abs(x), Literal(1e15)), replica)), Some(x))
    case _ => Round(child, Literal(scale))
  }

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cypher_round"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
