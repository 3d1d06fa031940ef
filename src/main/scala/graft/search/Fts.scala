package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Full-text search as DataFrame compositions: inverted index build,
  * TF-IDF / BM25 scoring, and reciprocal-rank fusion — the Spark-first
  * re-expression of the reference's LanceDB/Tantivy FTS surface
  * (index: generate_note_embeddings.py:49, hybrid+RRF: rag.py:85-94).
  *
  * Scale design: the index IS a DataFrame — `(term, doc_id, tf)`
  * partitioned by term hash, built with one explode + one groupBy
  * (map-side partial counts). Query = a semi-join of query terms
  * against the postings (pushdown-prunable when the postings table is
  * written bucketed/partitioned by term), then a per-doc aggregation
  * and TakeOrderedAndProject top-k. No per-node index structure, so
  * it scales with executors and rebuilds incrementally by union.
  */
object Fts {

  /** Inverted-index postings: one row per (term, doc) with term
    * frequency. The corpus-side half of BM25.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Per-doc token length — BM25's length normalization input. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(TextFunctions.tokens(col(textCol))).as("dl"))

  /** Document frequency per term (from postings — no rescan). */
  def docFreq(post: DataFrame): DataFrame =
    post.groupBy("term").agg(count(lit(1)).as("df"))

  /** TF-IDF-lite scores with a linear idf `(N + 1 - df)` — all-integer
    * arithmetic, so ranking is exact and engine-portable. Returns
    * (doc_id, score) for docs matching ≥1 query term.
    */
  def tfidfScores(post: DataFrame, nDocs: Long, queryTerms: Seq[String]): DataFrame = {
    val matched = post.filter(col("term").isin(queryTerms: _*))
    matched.join(broadcast(docFreq(matched)), "term")
      .groupBy("doc_id")
      .agg(sum(col("tf") * (lit(nDocs) + 1 - col("df"))).as("score"))
  }

  /** BM25 (k1, b defaults 1.2/0.75): idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * tf_norm = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)). Double-precision;
    * the rank order is what matters at the API level.
    */
  def bm25Scores(
      post: DataFrame, docLen: DataFrame, nDocs: Long, avgdl: Column,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val matched = post.filter(col("term").isin(queryTerms: _*))
    val withDf = matched.join(broadcast(docFreq(matched)), "term")
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfn = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    withDf.join(docLen, "doc_id")
      .groupBy("doc_id")
      .agg(sum(idf * tfn).as("score"))
  }

  /** Reciprocal Rank Fusion of two ranked lists (reference
    * RRFReranker default k=60, rag.py:85-94): full-outer join on id,
    * score = Σ 1/(k+rank). With two lists the addition is a single
    * commutative IEEE op — bit-exact across engines.
    * Inputs need columns (id, rank).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60): DataFrame = {
    val ra = a.select(col("id"), col("rank").as("rank_a"))
    val rb = b.select(col("id"), col("rank").as("rank_b"))
    ra.join(rb, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0))).as("rrf"))
  }
}
