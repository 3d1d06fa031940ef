package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-shaped filter
  * with an actual LM where t8's OOV rate stops at vocabulary
  * membership: per-document cross-entropy under an add-one-smoothed
  * bigram model, the classic "how surprising is this text" signal
  * that ranks boilerplate, gibberish, and off-distribution documents
  * for the curation gates (x7's quantile machinery composes
  * downstream).
  *
  * Scale shape: model counts are two keyed aggregates (bigram,
  * unigram) over one tokenization pass; scoring joins each document
  * bigram against the count tables ON THE BIGRAM KEY — corpus-sized
  * shuffle joins, never a broadcast of an unbounded vocabulary — and
  * V rides a broadcast 1-row frame. The per-document sum is
  * ORDER-DETERMINISTIC by construction: ln terms collect into a
  * position-sorted array and reduce left-to-right, so the score is
  * bit-stable across partitionings and replayable by an oracle
  * engine (a plain float groupBy-sum would drift with shuffle
  * order). The per-doc array is document-length-bounded.
  */
object NgramLm {

  /** Per-document bigram cross-entropy (nats) of `docs` under the
    * add-one-smoothed bigram model of `model` (pass the same frame to
    * self-score a corpus): P(w2|w1) = (c12 + 1) / (c1 + V). Documents
    * with fewer than two tokens drop (no bigram mass). Returns
    * (doc_id, n_bigrams, xent).
    */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String): DataFrame = {
    val mToks = model.select(TextFunctions.tokens(col(modelTextCol)).as("toks"))
    val c12 = mToks
      .select(explode(TextFunctions.bigrams(col("toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val uni = mToks.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vStats = uni.agg(count(lit(1)).as("v"))
    val bg = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        posexplode(TextFunctions.bigrams(col("toks"))).as(Seq("pos", "bg")))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    // left joins + coalesce(0): a bigram or unigram unseen by the
    // model still scores (the smoothing's whole point) — scoring NEW
    // text against a reference LM is the production shape
    val lnp = -log(
      (col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
    val scored = bg
      .join(c12, Seq("bg"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .na.fill(0L, Seq("c12", "c1"))
      .crossJoin(broadcast(vStats))
      .select(col(idCol), col("pos"), lnp.as("lnp"))
    scored.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("lnp")))).as("__a"))
      .select(col(idCol), size(col("__a")).as("n_bigrams"),
        (aggregate(col("__a"), lit(0.0), (acc, x) => acc + x.getField("lnp")) /
          size(col("__a")).cast("double")).as("xent"))
  }
}
