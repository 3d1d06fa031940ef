package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** The composed corpus-curation stage of an LLM data pipeline —
  * quality filter → language filter → dedup → decontamination — as
  * one operator over a `documents`-shaped frame. Each stage exists
  * standalone ([[graft.text.TextFunctions]], [[graft.dedup.Dedup]]);
  * this is the production composition, ordered for scale:
  * the per-row filters run FIRST (pure codegen'd expressions at scan
  * speed, no shuffle) so everything shuffle-bound downstream — the
  * shingle joins, the component fixpoint, the contamination join —
  * sees the smallest possible corpus.
  */
object Curation {

  /** Clean a corpus end to end. Keeps rows that (1) score quality
    * bucket "ok", (2) language-ID into `keepLangs`, (3) survive exact
    * + near-dup dedup ([[Dedup.dedupCorpus]] — min-id representative
    * per duplicate group), and (4) when `eval` is given, share fewer
    * than `minCommon` rare shingles with every eval document
    * ([[Dedup.contaminationPairs]] — benchmark-leak removal).
    * Schema unchanged; only compact id sets are ever materialized, so
    * the result streams scan→sink at any scale.
    */
  // NO whole-body Tuning.withCachedPlanAqe wrapper (r20): an outer
  // scope would re-enable byte-based cached-plan re-planning across
  // every nested stage — including the jaccard-verify and
  // contamination CHECKPOINTS that dedupCorpusAndPostings/
  // contaminationFromTrainPostings deliberately run outside their own
  // scopes (tiny-bytes/heavy-compute per pair; coalescing serialized
  // the d11 verify onto one task, r19's one driver-confirmed
  // regression). Each nested operator scopes exactly the eager cache
  // materializations that benefit; this composition adds none.
  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String], shingleK: Int, minJaccard: Double,
      maxDf: Int = 64, eval: Option[DataFrame] = None,
      minCommon: Long = 3L): DataFrame = {
    require(keepLangs.nonEmpty, "empty language whitelist keeps nothing")
    // The quality/language gate is pure codegen'd regexp_counts over
    // the text (r19 — no token arrays, no interpreted HOFs). The
    // dedup stage still consumes this frame from several plans (exact
    // groups, both sides of the shingle self-join, the survivor
    // joins), so persist the filtered slim projection and release it
    // once the survivor ID SET (compact) is checkpointed. The
    // returned frame is a lazy semi-join of the raw input against
    // those ids — no filter re-run, no corpus in cache.
    val text = col(textCol)
    val kept = docs.filter(
        TextFunctions.qualityBucket(TextFunctions.tokenCount(text),
          TextFunctions.punctRatio(text),
          TextFunctions.stopwordRatio(text)) === "ok" &&
          TextFunctions.langId(text).isin(keepLangs: _*))
      .select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager: dedupCorpus's first job joins TWO subtrees reading
    // `kept` (the exact-group semi-join), whose map stages run
    // concurrently — without materializing the cache first, the
    // interpreted-HOF quality filter runs once PER SIDE (measured r19
    // at sf0.1: 2 × 1.27 s of the d12 total; opt guide §1.2)
    kept.count()
    // postings THREADING (r19): the dedup stage already tokenized and
    // shingled the corpus; decontamination consumes the SAME postings
    // restricted to the dedup survivors (postings are per-doc facts,
    // so filtering the cached frame by survivor id is row-identical
    // to re-shingling the deduped corpus) — one full-corpus tokenize
    // scan saved per run at any scale.
    val (_, dedupIds, post) = Dedup.dedupCorpusAndPostings(
      kept, idCol, textCol, shingleK, minJaccard, maxDf)
    val survivorIds = eval.fold(dedupIds) { ev =>
      val tp = post
        .join(dedupIds.withColumnRenamed(idCol, "id"), Seq("id"), "left_semi")
        .withColumnRenamed("id", "train_id")
      val contaminated = Dedup.contaminationFromTrainPostings(tp, ev,
        idCol, textCol, shingleK, minCommon, maxDf, release = Seq.empty)
        .select(col("train_id").as(idCol)).distinct()
      dedupIds.join(contaminated, Seq(idCol), "left_anti")
    }
    val ids = survivorIds.localCheckpoint(true)
    post.unpersist(false)
    kept.unpersist(false)
    docs.join(ids, Seq(idCol), "left_semi")
  }
}
