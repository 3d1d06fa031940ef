package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native int_dot expression vs the HOF composition it replaced. */
class IntDotExprSpec extends SparkSpec {
  import TestSession.spark.implicits._
  import org.apache.spark.sql.functions._

  graft.functions.GraftFunctions.register(spark)

  test("int_dot equals the zip_with+aggregate HOF on random long arrays") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-10000000L, 10000000L))
    val rows = (0 until 50).flatMap { i =>
      for {
        a <- gen(Gen.Parameters.default, Seed(i.toLong))
        b <- gen(Gen.Parameters.default, Seed(1000L + i))
      } yield (a, b)
    }
    assert(rows.nonEmpty)
    val df = rows.toDF("a", "b")
      .select(
        graft.search.Vectors.intDot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("int_dot: null side -> null; shorter length wins; SQL-registered") {
    val r = spark.sql(
      "SELECT int_dot(array(2L, 3L), array(10L, 10L, 99L)) AS d," +
        " int_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n").head()
    assert(r.getLong(0) === 50L)
    assert(r.isNullAt(1))
  }

  test("int_dot runs inside whole-stage codegen on the KNN scan") {
    val iv = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.search.Vectors.intVector(col("embedding")).as("iv"))
    val q = iv.filter(col("vec_id") === 0).select(col("iv").as("qv"))
    val knn = graft.search.Vectors.knnDot(iv, "vec_id", q, 5)
    knn.collect() // finalize the adaptive plan so codegen spans render
    val p = knn.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined, p.take(400))
    assert(p.contains("int_dot"), "the ranking column must be the native expression")
  }
}

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, GraftFunctions}
import graft.search.Vectors

class CosineExprSpec extends SparkSpec {
  import TestSession.spark.implicits._

  GraftFunctions.register(spark)

  test("cosine_sim SQL function matches the HOF formulation on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"), expr("cosine_sim(embedding, qv)").as("fast"),
        Vectors.cosine(col("embedding"), col("qv")).as("slow"))
    val bad = both.filter(abs(col("fast") - col("slow")) > 1e-12).count()
    assert(bad === 0, "native expression and HOF cosine must agree")
  }

  test("interpreted eval path agrees with codegen (known vectors)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit_(xs: Seq[Float]) = Literal(
      CatalystTypeConverters.createToCatalystConverter(ArrayType(FloatType))(xs),
      ArrayType(FloatType))
    val same = CosineSimilarity(lit_(Seq(1f, 0f)), lit_(Seq(2f, 0f))).eval(null)
    val orth = CosineSimilarity(lit_(Seq(1f, 0f)), lit_(Seq(0f, 3f))).eval(null)
    val zero = CosineSimilarity(lit_(Seq(0f, 0f)), lit_(Seq(1f, 1f))).eval(null)
    assert(math.abs(same.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(orth.asInstanceOf[Double]) < 1e-12)
    assert(zero.asInstanceOf[Double] === 0.0)
  }

  test("null inputs yield null; top-k by cosine_sim ranks self first") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").head()
    assert(r.isNullAt(0))
    val e = graft.core.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val top = e.crossJoin(broadcast(q))
      .selectExpr("vec_id", "cosine_sim(embedding, qv) AS c")
      .orderBy(col("c").desc, col("vec_id")).limit(1).head()
    assert(top.getLong(0) === 3L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
  }

  test("expression stays inside whole-stage codegen") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .selectExpr("vec_id", "cosine_sim(embedding, qv) AS c")
    df.collect() // AQE finalizes the physical plan on execution
    val plan = df.queryExecution.executedPlan.toString
    // under AQE the codegen stage shows as the `*(n)` marker on the
    // Project containing cosine_sim
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_sim") && l.trim.startsWith("+- *(")
        || l.contains("*(") && l.contains("cosine_sim")), plan)
  }
}
