package graft

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** [[graft.functions.CypherRound]] — the schema-adaptive Cypher round.
  * Doubles must round their BINARY value exactly as the DuckDB oracle
  * (std::round(x·10^s)/10^s, half away from zero); everything else
  * keeps stock Spark Round (exact HALF_UP, schema unchanged).
  */
class CypherRoundSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def cr(c: Column, scale: Int): Column =
    GraftExpressionBridge.column(graft.functions.CypherRound(
      GraftExpressionBridge.expression(c), scale))

  test("double input rounds the binary value like DuckDB, not the string") {
    // the double nearest 4201.315 is 4201.31499999999996…: its
    // SHORTEST STRING is "4201.315" (stock Spark Round → 4201.32)
    // but its binary value × 100 floors to 420131 (DuckDB → 4201.31).
    // This is the observed g73/g98 divergence at sf0.001.
    val rows = Seq(4201.315, -4201.315, 2.675, -2.675, 0.125, -0.125,
      1.005, 1234.56789, 0.0, 1e15 + 0.5).toDF("x")
      .select(col("x"), cr(col("x"), 2).as("r")).collect()
    // expected = DuckDB's computation, replayed in identical IEEE ops
    def duck(x: Double): Double =
      if (math.abs(x) >= 1e15) x
      else math.signum(x) * math.floor(math.abs(x) * 100.0 + 0.5) / 100.0
    rows.foreach { r =>
      val (x, got) = (r.getDouble(0), r.getDouble(1))
      assert(got === duck(x), s"x=$x")
    }
    // and the headline case is concretely the digit stock Round flips
    assert(duck(4201.315) === 4201.31)
  }

  test("scale 0, NaN, infinities, null pass through like DuckDB") {
    val r = Seq((2.5, 1)).toDF("x", "k").select(
      cr(lit(2.5), 0).as("a"),          // std::round: half AWAY from zero
      cr(lit(-2.5), 0).as("b"),
      cr(lit(Double.NaN), 2).as("nan"),
      cr(lit(Double.PositiveInfinity), 2).as("inf"),
      cr(lit(null).cast(DoubleType), 2).as("nul")).head()
    assert(r.getDouble(0) === 3.0 && r.getDouble(1) === -3.0)
    assert(r.getDouble(2).isNaN && r.getDouble(3).isPosInfinity)
    assert(r.isNullAt(4))
  }

  test("non-floating inputs keep stock Round: schema and value unchanged") {
    val df = Seq(("x")).toDF("s").select(
      cr(lit(BigDecimal("4201.315")).cast(DecimalType(10, 3)), 2).as("dec"),
      cr(lit(7L), 2).as("lng"))
    assert(df.schema("dec").dataType.isInstanceOf[DecimalType])
    assert(df.schema("lng").dataType === LongType)
    val r = df.head()
    // exact decimal HALF_UP: a true .5 tie rounds up — both engines
    assert(r.getDecimal(0).toPlainString === "4201.32")
    assert(r.getLong(1) === 7L)
  }

  test("cypher round(avg(..), 2) over doubles matches the decimal-exact oracle") {
    // end-to-end through CypherLite: the g73 shape over a tiny graph
    val nodes = Seq(("a", 1.115), ("b", 1.115), ("c", 2.085))
      .toDF("id", "bal")
    val duck = (x: Double) => math.floor(math.abs(x) * 100.0 + 0.5) / 100.0
    val out = nodes.agg(
      sum(col("bal").cast(DecimalType(38, 10))).cast("double").as("s"),
      count(lit(1)).as("n"))
      .select(cr(col("s") / col("n"), 2).as("r")).head().getDouble(0)
    assert(out === duck((1.115 + 1.115 + 2.085) / 3))
  }
}
