package graft

import org.apache.spark.sql.functions._

import graft.search.Vectors

/** Native int_vector expression vs the HOF composition it replaced —
  * the equivalence MUST be bit-exact (every integer-dot oracle hash
  * rides on these longs).
  */
class IntVectorExprSpec extends SparkSpec {
  import TestSession.spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def hof(v: org.apache.spark.sql.Column) =
    transform(v, x => round(x * 1e7).cast("long"))

  test("int_vector equals the transform+round HOF on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val both = e.select(
      Vectors.intVector(col("embedding")).as("fast"),
      hof(col("embedding")).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() === 0)
  }

  test("int_vector matches HOF on edge-case floats (halves, subnormals, null elems)") {
    val rows: Seq[Seq[java.lang.Float]] = Seq(
      Seq[java.lang.Float](0.00000005f, -0.00000005f, 0.15f, -0.15f),
      Seq[java.lang.Float](1.5e-7f, -1.5e-7f, 2.5e-7f, -2.5e-7f),
      Seq[java.lang.Float](null, 1.0f, null),
      Seq[java.lang.Float](Float.MinPositiveValue, -0.0f, 0.0f))
    val df = rows.toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(Vectors.intVector(col("v")).as("fast"), hof(col("v")).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0)
  }

  test("int_vector saturates NaN/Inf (non-ANSI cast) instead of throwing") {
    // the HOF under Spark 4's default ANSI mode THROWS on these; the
    // native expression keeps the documented non-ANSI saturation so a
    // corrupt vector degrades deterministically instead of failing the
    // whole scan
    val r = Seq(Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
        Float.MaxValue))
      .toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(Vectors.intVector(col("v")).as("f"))
      .head().getSeq[Long](0)
    assert(r === Seq(0L, Long.MaxValue, Long.MinValue, Long.MaxValue))
  }

  test("int_vector on ARRAY<DOUBLE> (query-literal path) matches HOF; null -> null") {
    val df = Seq(Seq(0.123456789, -3.5e-8, 42.0)).toDF("v")
      .select(Vectors.intVector(col("v")).as("fast"), hof(col("v")).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0)
    val r = spark.sql("SELECT int_vector(CAST(NULL AS ARRAY<FLOAT>))").head()
    assert(r.isNullAt(0))
  }

  test("the v1 scan path runs int_vector AND int_dot inside whole-stage codegen") {
    val iv = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
    val q = iv.filter(col("vec_id") === 0).select(col("iv").as("qv"))
    val knn = Vectors.knnDot(iv, "vec_id", q, 5)
    knn.collect()
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("int_vector"), "scan projection must be the native expression")
    assert(!p.contains("lambdafunction"), "no interpreted HOF may remain on the KNN path")
  }
}
