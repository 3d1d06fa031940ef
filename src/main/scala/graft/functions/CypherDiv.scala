package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression,
  IntegralDivide, RuntimeReplaceable}
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType,
  DoubleType, IntegerType, LongType, ShortType}

/** Cypher's `/` — SCHEMA-ADAPTIVE division. Neo4j divides integrally
  * when both operands are integers (`7 / 2 = 3`, truncated toward
  * zero — the decade-bucket idiom `x / 10 * 10` relies on it) and in
  * doubles otherwise. Which branch applies depends on the OPERAND
  * TYPES, which for property references are a fact about the graph's
  * node tables — unknown where the engine's pattern-WHERE and CASE
  * conditions compile (parse time, no frame in hand). This expression
  * defers the decision to ANALYSIS time, when Spark resolves the
  * children against the actual frame: `replacement` reads the
  * resolved child types and picks
  *
  *   - both integral (byte/short/int/long) → `IntegralDivide` over
  *     longs — Spark's `div`, Java long division, truncation toward
  *     zero exactly as Neo4j (verified: `-7 div 2 = -3`); result LONG.
  *   - anything else → double division; result DOUBLE. (Neo4j has no
  *     decimal type — its FLOAT is a 64-bit double — so the engine
  *     normalizes non-integral division to doubles.)
  *
  * One expression serves EVERY syntactic position — RETURN/WITH
  * items, WHERE predicates (node-predicate and row-filter routes),
  * CASE conditions, ORDER BY keys, aggregate bodies — so the typing
  * can never diverge between positions the way a parse-time oracle
  * threaded through only some call sites did (the round-16
  * WHERE-position divergence this replaces: reference semantics per
  * Kuzu/Neo4j Cypher, cf. reference src/baml_src/rag.baml:65-102
  * which lets an LLM emit arbitrary Cypher).
  *
  * `RuntimeReplaceable`: the analyzer types this node from its
  * replacement; the optimizer's ReplaceExpressions swaps the
  * replacement in before execution, so the evaluated plan contains
  * only stock Spark arithmetic — whole-stage codegen, divide-by-zero
  * behavior (ANSI: loud error; else null) identical to building the
  * stock operators directly.
  */
case class CypherDiv(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def decimal(dt: DataType): Boolean = dt.isInstanceOf[DecimalType]

  override lazy val replacement: Expression =
    if (integral(left.dataType) && integral(right.dataType))
      IntegralDivide(Cast(left, LongType), Cast(right, LongType))
    // DECIMAL operands keep decimal division (round-17 advice: the
    // unconditional double cast lost precision and changed the output
    // type for decimal-typed property columns — stock Spark Divide
    // derives the result precision itself since 3.4). A decimal
    // beside an integral widens the integral to decimal(20,0); a
    // decimal beside a float/double falls to the double branch
    // (Neo4j FLOAT is a 64-bit double — mixed float math is double).
    else if ((decimal(left.dataType) || decimal(right.dataType)) &&
        Seq(left, right).forall(e =>
          decimal(e.dataType) || integral(e.dataType))) {
      def toDec(e: Expression): Expression =
        if (decimal(e.dataType)) e else Cast(e, DecimalType(20, 0))
      Divide(toDec(left), toDec(right))
    }
    else
      Divide(Cast(left, DoubleType), Cast(right, DoubleType))

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "cypher_div"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
