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
    // bigram rows via the codegen'd position explode (r19 — see
    // TextFunctions.bigramPositions); the size filter replaces the
    // HOF form's explode-of-empty row drop
    val c12 = mToks
      .where(size(col("toks")) >= 2)
      .select(col("toks"),
        explode(TextFunctions.bigramPositions(col("toks"))).as("__p"))
      .select(TextFunctions.bigramAt(col("toks"), col("__p")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val uni = mToks.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vStats = uni.agg(count(lit(1)).as("v"))
    // same position-explode idiom; pos keeps the HOF form's 0-base,
    // and w1 reads element_at directly instead of re-splitting the
    // just-concatenated bigram string
    val bg = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), col("toks"),
        explode(TextFunctions.bigramPositions(col("toks"))).as("__p"))
      .select(col(idCol), (col("__p") - 1).cast("int").as("pos"),
        TextFunctions.bigramAt(col("toks"), col("__p")).as("bg"),
        element_at(col("toks"), col("__p")).as("w1"))
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

  /** Per-source KL divergence of the unigram distribution from the
    * corpus-wide distribution — the mixture-drift monitor for the
    * sampling stages (x3/x12 set per-source rates; this measures how
    * far each source's language actually sits from the blend):
    * KL(p_s ‖ q) = Σ_w p_s(w)·ln(p_s(w)/q(w)) over the corpus
    * vocabulary with add-one smoothing (p_s = (n_sw+1)/(N_s+V),
    * q = (n_w+1)/(N+V) — both strictly positive, so every term is
    * finite). Returns (source, n_tokens, kl), kl rounded to 8
    * decimals (the t9 discipline: everything is exact integer
    * arithmetic until the final ln/divide, and rounding absorbs ln's
    * engine-specific last bit).
    *
    * Scale shape: one tokenization pass → (source, w) counts; the
    * evaluation grid is vocab × sources via a BROADCAST of the
    * source-count-sized totals (never vocab²); the per-source sum
    * folds a vocab-sorted array left-to-right — order-stable, like
    * t9's per-doc fold. The per-source array is vocab-bounded: fine
    * to |V| ~ millions; beyond that, segment the fold by word prefix
    * and sum segment results in prefix order.
    */
  def sourceKlDivergence(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(sourceCol).as("source"),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("n_sw"))
    val srcTotals = sw.groupBy("source").agg(sum("n_sw").as("n_s"))
    val wTotals = sw.groupBy("w").agg(sum("n_sw").as("n_w"))
    val stats = wTotals.agg(sum("n_w").as("n"), count(lit(1)).as("v"))
    val p = (col("n_sw") + 1).cast("double") / (col("n_s") + col("v")).cast("double")
    val q = (col("n_w") + 1).cast("double") / (col("n") + col("v")).cast("double")
    val terms = wTotals
      .crossJoin(broadcast(srcTotals)) // vocab × |sources| — sources broadcast
      .join(sw, Seq("source", "w"), "left_outer")
      .na.fill(0L, Seq("n_sw"))
      .crossJoin(broadcast(stats))
      .select(col("source"), col("w"), col("n_s"), (p * log(p / q)).as("t"))
    terms.groupBy("source")
      .agg(first(col("n_s")).as("n_tokens"),
        array_sort(collect_list(struct(col("w"), col("t")))).as("__a"))
      .select(col("source"), col("n_tokens"),
        round(aggregate(col("__a"), lit(0.0),
          (acc, x) => acc + x.getField("t")), 8).as("kl"))
  }
}
