package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Native simhash_sig expression vs the Column-composition form. */
class SimHashExprSpec extends SparkSpec {
  import TestSession.spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  test("simhash_sig equals Dedup.simhash bit-for-bit on real documents") {
    val docs = graft.core.Tables.documents(spark, sf)
    val both = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"),
        Dedup.simhash(col("text"), 16).as("slow"))
      .selectExpr("doc_id", "slow", "simhash_sig(toks, 16) AS fast")
    assert(both.filter(col("slow") =!= col("fast")).count() === 0)
    assert(both.count() > 0)
  }

  test("empty token array gives the all-ones signature (composition parity)") {
    val one = spark.sql("SELECT simhash_sig(CAST(array() AS ARRAY<STRING>), 16) AS s")
      .as[Long].head()
    assert(one === (1L << 16) - 1, "2*0 >= 0 sets every bit, like the WHEN form")
  }

  test("null tokens yield null; nBits must be a literal in range") {
    val n = spark.sql("SELECT simhash_sig(CAST(NULL AS ARRAY<STRING>), 16)").head()
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT simhash_sig(array('a'), 99)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("nbits"))
    val nullBits = intercept[Exception] {
      spark.sql("SELECT simhash_sig(array('a'), CAST(NULL AS INT))").collect()
    }
    assert(nullBits.getMessage.toLowerCase.contains("null"),
      "foldable NULL nBits must type-check-fail, not NPE")
  }

  test("null ELEMENTS are skipped, not NPE — sql-reachable input") {
    // registered SQL function ⇒ arbitrary user arrays reach compute();
    // a null element must drop from the vote like the filter-lambda
    // drops it in the composition form
    val withNull = spark.sql(
      "SELECT simhash_sig(array('a', CAST(NULL AS STRING), 'b'), 16) AS s")
      .as[Long].head()
    val without = spark.sql("SELECT simhash_sig(array('a', 'b'), 16) AS s")
      .as[Long].head()
    assert(withNull === without)
  }

  test("the expression runs inside whole-stage codegen") {
    val p = graft.core.Tables.documents(spark, sf)
      .select(TextFunctions.tokens(col("text")).as("toks"))
      .selectExpr("simhash_sig(toks, 16) AS s")
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span in the simple
    // plan string — the projection containing simhash_sig must carry it
    assert("""\*\(\d+\) Project \[simhash_sig""".r.findFirstIn(p).isDefined, p.take(500))
  }
}
