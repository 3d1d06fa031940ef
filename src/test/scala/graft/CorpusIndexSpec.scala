package graft

import org.apache.spark.sql.functions._

import graft.rag.Rag
import graft.search.{Fts, HashEmbedder}

/** The bucketed index layout (S8 at scale): postings saved
  * term-bucketed behave like an inverted index on disk — term
  * filters prune buckets, term-keyed aggregation and joins skip the
  * exchange.
  */
class CorpusIndexSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private lazy val index: Rag.CorpusIndex = {
    val docs = Seq(
      (1L, "spark shuffles are expensive"),
      (2L, "bucketed tables avoid the shuffle"),
      (3L, "the index is a table")).toDF("doc_id", "text")
    val built = Rag.CorpusIndex.build(spark, docs, HashEmbedder())
    Rag.CorpusIndex.saveBucketed(spark, built, "cis", nBuckets = 8)
    Rag.CorpusIndex.loadBucketed(spark, "cis")
  }

  test("bucketed round trip preserves the index contents") {
    assert(index.post.as[(String, Long, Long)].collect().toSet ===
      Fts.postings(index.docs, "doc_id", "text")
        .as[(String, Long, Long)].collect().toSet)
    assert(index.stats.select("n_docs").as[Long].head() === 3L)
  }

  test("term filter bucket-prunes the postings scan") {
    // DisableUnnecessaryBucketedScan treats a bare filter as "no
    // interesting partitioning" and drops the bucketed read (losing
    // pruning with it); pin it on, as a real index-serving session
    // would
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val q = index.post.filter(col("term") === "shuffle")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"a single-term lookup must read one bucket:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("docFreq over bucketed postings aggregates with NO exchange") {
    val plan = Fts.docFreq(index.post).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy(term) must ride the bucket partitioning:\n$plan")
  }

  test("tfidf scoring over the bucketed index stays correct") {
    val top = Fts.tfidfScores(index.post, index.stats, Seq("shuffle", "spark"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .as[(Long, Long)].collect().map(_._1)
    assert(top.nonEmpty && top.toSet.subsetOf(Set(1L, 2L)))
  }
}
