package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-path evidence beyond PlanSpec: bucketed co-located joins
  * (the zero-shuffle fact-to-fact join story), graph persistence
  * round-trip, and null-propagating key synthesis.
  */
class ScaleSpec extends SparkSpec {

  test("saltedJoin result is identical to the plain equi-join") {
    import TestSession.spark.implicits._
    // one hot key carrying 90% of rows — the shape that starves a
    // single reducer in the unsalted plan
    val big = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (1 to 100).map(i => (i.toLong + 1000, s"k${i % 7}")))
      .toDF("row_id", "k")
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .map(k => (k, s"label_$k")).toDF("k", "label")
    val salted = graft.core.Skew.saltedJoin(big, dim, "k", "row_id", nSalts = 8)
      .select("row_id", "k", "label").as[(Long, String, String)].collect().toSet
    val plain = big.join(dim, Seq("k"))
      .select("row_id", "k", "label").as[(Long, String, String)].collect().toSet
    assert(salted === plain && salted.size === 1000)
    // salting BY the join key spreads nothing — rejected, not degraded
    val degenerate = intercept[IllegalArgumentException] {
      graft.core.Skew.saltedJoin(big, dim, "k", "k", nSalts = 8)
    }
    assert(degenerate.getMessage.contains("saltFrom"))
  }

  test("bucketed tables join WITHOUT a shuffle exchange on the join key") {
    // At 100 TB, two fact tables bucketed on the same key join with
    // no Exchange: each bucket pairs 1:1. Demonstrated end-to-end
    // through the real writer/catalog.
    val orders = graft.core.Tables.orders(spark, sf)
    val li = graft.core.Tables.lineitem(spark, sf)
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle on the join key:\n$plan")
    // and it computes the right thing
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    spark.sql("DROP TABLE b_orders"); spark.sql("DROP TABLE b_lineitem")
  }

  test("date-partitioned layout prunes partitions at the scan, not post-filter") {
    // The time-series layout contract: events written partitioned by
    // day are read back with a day filter that eliminates partitions
    // at PLANNING time (PartitionFilters on the scan) — at 100 TB the
    // difference between reading one day and reading the year.
    val dir = Files.createTempDirectory("graft_part").toString
    graft.core.Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(col("day") === "2024-01-02")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).mkString
    assert(scan.contains("day"), s"day filter must prune partitions:\n$scan")
    assert(!scan.contains("PartitionFilters: []"),
      s"partition filter list must be non-empty:\n$scan")
    // the pruned read computes the same answer as the unpartitioned
    // source filtered directly
    val want = graft.core.Tables.events(spark, sf)
      .where(to_date(col("ts")) === "2024-01-02")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want && got.values.sum > 0)
  }

  test("FHIR graph parquet round-trip preserves nodes, edges, and answers") {
    val dir = Files.createTempDirectory("graft_graph").toString
    val df = graft.fhir.FhirPipeline.load(spark, "/root/reference/data/extracted_fhir.json")
      .limit(300)
    val g = graft.fhir.FhirPipeline.buildGraph(df)
    graft.fhir.FhirPipeline.writeGraph(g, dir)
    val back = graft.fhir.FhirPipeline.readGraph(spark, dir,
      g.edges.map { case (k, (s, d, _)) => k -> ((s, d)) })
    assert(back.nodes.keySet === g.nodes.keySet)
    assert(back.edges.keySet === g.edges.keySet)
    for (l <- g.nodes.keys)
      assert(back.nodes(l).count() === g.nodes(l).count(), s"node count differs for $l")
    for (r <- g.edges.keys)
      assert(back.edges(r)._3.count() === g.edges(r)._3.count(), s"edge count differs for $r")
  }

  test("key synthesis: null components nullify the whole key (Polars concat_str semantics)") {
    import TestSession.spark.implicits._
    val df = Seq(
      (1L, Some("12 Main St"), Some("02111")),
      (2L, None: Option[String], Some("02111")),
      (3L, Some("9 Elm"), None: Option[String]))
      .toDF("record_id", "line", "postalCode")
      .select(col("record_id"), struct(col("line"), lit(null).cast("string").as("city"),
        lit(null).cast("string").as("state"), col("postalCode"),
        lit(null).cast("string").as("country")).as("address"))
    val prepped = graft.fhir.FhirPipeline.prepAddress(df)
      .select("record_id", "id").as[(Long, Option[String])].collect().toMap
    assert(prepped(1L) === Some("12 main st_02111"))
    assert(prepped(2L) === None, "null line must nullify the key")
    assert(prepped(3L) === None, "null postalCode must nullify the key")
  }

  test("sortedRowIndex matches row_number over a global sort, without a window") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.core.Tables.documents(spark, TestSession.sf001).select("doc_id")
    val viaWindow = docs
      .withColumn("rid", row_number().over(Window.orderBy("doc_id")).cast("long"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaKeys = graft.core.GraftKeys.sortedRowIndex(docs, Seq(col("doc_id")))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaKeys.toSeq === viaWindow.toSeq)
    // and the scalable plan truly avoids the single-partition window
    val plan = graft.core.GraftKeys.sortedRowIndex(docs, Seq(col("doc_id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sortedRowIndex must not plan a window:\n$plan")
  }

  test("documents scan prunes to the referenced columns for text ops") {
    val p = SparkEntry.queries("t1_token_count")(spark, sf)
      .queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"),
      s"unused document columns must be pruned: $read")
  }
}
