package graft

import org.apache.spark.sql.functions._

/** Native q8_vector / the rewritten q8Scale vs the HOF compositions
  * they replaced (r19) — bit-equality on real embeddings and edge
  * shapes, the IntVectorExprSpec discipline.
  */
class Q8VectorExprSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def hofScale(v: org.apache.spark.sql.Column) =
    array_max(transform(v, x => abs(x.cast("double"))))
  private def hofQ8(v: org.apache.spark.sql.Column,
      scale: org.apache.spark.sql.Column) =
    transform(v, x =>
      when(scale > lit(0.0), floor(x.cast("double") / scale * 127))
        .otherwise(lit(0L)).cast("byte"))

  test("q8Scale and q8Vector equal the HOF forms on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("s_hof", hofScale(col("embedding")))
      .withColumn("s_new", graft.search.Vectors.q8Scale(col("embedding")))
    assert(e.filter(!(col("s_hof") <=> col("s_new"))).count() === 0)
    val q = e
      .withColumn("q_hof", hofQ8(col("embedding"), col("s_hof")))
      .withColumn("q_new",
        graft.search.Vectors.q8Vector(col("embedding"), col("s_new")))
    assert(q.filter(!(col("q_hof") <=> col("q_new"))).count() === 0)
  }

  test("edge shapes: zero vector, negatives, null vector, null element") {
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f)),            // scale 0 -> all-zero bytes
      (2L, Seq(-3.5f, 1.25f, -0.0f)),   // negative max-|x| side
      (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "v")
      .union(Seq((4L, Seq[java.lang.Float](1.0f, null, -2.0f)))
        .toDF("id", "v").select(col("id"), col("v").cast("array<float>")))
    val out = rows
      .withColumn("s_hof", hofScale(col("v")))
      .withColumn("s_new", graft.search.Vectors.q8Scale(col("v")))
      .withColumn("q_hof", hofQ8(col("v"), col("s_hof")))
      .withColumn("q_new", graft.search.Vectors.q8Vector(col("v"), col("s_new")))
    assert(out.filter(!(col("s_hof") <=> col("s_new"))).count() === 0)
    assert(out.filter(!(col("q_hof") <=> col("q_new"))).count() === 0)
    val z = out.filter(col("id") === 1L).select("q_new").head()
      .getSeq[Byte](0)
    assert(z === Seq(0.toByte, 0.toByte))
  }

  test("q8_vector runs inside whole-stage codegen on the index build") {
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.search.Vectors.q8Scale(col("embedding")).as("scale"))
      .select(col("vec_id"),
        graft.search.Vectors.q8Vector(col("embedding"), col("scale")).as("q8"))
    e.collect()
    val p = e.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined, p.take(400))
    assert(p.contains("q8_vector"), "index build must use the native expression")
  }
}
