package graft

import graft.pipeline.Curation

/** The composed curation stage: every stage must fire — quality,
  * language, near-dup dedup, decontamination — each witnessed by a
  * doc that only that stage removes.
  */
class CurationSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val t1 = "the quick brown fox jumps over the lazy dog and runs to the field"
  private val t2 = t1 + " now"                       // near-dup of t1
  private val t3 = "short text here"                 // too_short
  private val t4 = "el la de que y los es el la de que the y los" // es (but quality-ok)
  private val t5 = "machine learning models train on large data sets in the cloud today"
  private val t6 = "a completely different story about cats and dogs playing in the park"
  private val ev = "machine learning models train on giant data sets in the cloud" // leaks t5

  test("cleanCorpus: each stage removes exactly its target") {
    val train = Seq(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t4, 5L -> t5, 6L -> t6)
      .toDF("doc_id", "text")
    val eval = Seq(100L -> ev).toDF("doc_id", "text")
    val out = Curation.cleanCorpus(train, "doc_id", "text", Seq("en"),
      shingleK = 3, minJaccard = 0.5, eval = Some(eval), minCommon = 3L)
    assert(out.columns.toSeq === train.columns.toSeq, "schema unchanged")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 6L),
      "2 deduped into 1, 3 too short, 4 non-English, 5 contaminated")
  }

  test("cleanCorpus without an eval set skips decontamination only") {
    val train = Seq(1L -> t1, 5L -> t5, 6L -> t6).toDF("doc_id", "text")
    val out = Curation.cleanCorpus(train, "doc_id", "text", Seq("en"),
      shingleK = 3, minJaccard = 0.5)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 5L, 6L))
  }
}
