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

  /** 1-row corpus statistics `(n_docs, avgdl)` from the doc-length
    * table. Folded into scoring plans via a broadcast cross-join so a
    * query is ONE job — never a mid-plan driver action (`.head()` on
    * the average was round 4's hygiene flag). At scale this frame is
    * maintained with the index and read back, not recomputed.
    */
  def corpusStats(docLen: DataFrame): DataFrame =
    docLen.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))

  /** Positional postings `(term, doc_id, pos)` — pos is the 0-based
    * token position. The positions Tantivy keeps alongside frequencies
    * for phrase queries; tf is `count(*)` per (term, doc_id), so this
    * table subsumes [[postings]] when phrases are needed. Same scale
    * shape: one explode, partition/bucket by term when written.
    */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Exact phrase occurrences: `(doc_id, phrase_tf)` for docs
    * containing `terms` at consecutive positions. Term i's rows are
    * position-shifted by −i and the m lists equi-join on
    * (doc_id, pos) — every join keys on the SAME columns, so the
    * shuffle partitioning is computed once and reused across the
    * chain, and each term's filter pushes to the postings scan
    * (partition-pruned when the table is term-partitioned). Never a
    * per-doc array walk: overlapping occurrences count correctly and
    * the plan is linear in matched postings.
    */
  def phraseMatch(posPost: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val first = posPost.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(
        posPost.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("phrase_tf"))
  }

  /** Compact an appended postings table of ADDITIVE deltas: rows for
    * the same (term, doc_id) merge by summing tf. Correct ONLY when
    * appends are partial counts of the same document (its text
    * ingested in chunks) — a RE-INGESTED document's complete postings
    * would double; use the versioned overload for that case. One
    * shuffle on (term, doc_id); exchange-free when the store is
    * term-bucketed (saveBucketed).
    */
  def compactPostings(post: DataFrame): DataFrame =
    post.groupBy("term", "doc_id").agg(sum("tf").as("tf"))

  /** Compact a postings store with RE-INGESTED documents:
    * last-write-wins per doc — only the rows of each document's
    * greatest `versionCol` survive (the streaming sink's `batch`
    * partition column is exactly this version). The surviving
    * version's rows then merge additively — so a version ingested in
    * chunks (several partial-tf rows for one (term, doc)) still
    * compacts to the one-row-per-(term, doc) invariant without
    * inflating tf across versions. The merge groups on the same
    * (term, doc_id) key the additive overload shuffles on.
    */
  def compactPostings(post: DataFrame, versionCol: String): DataFrame = {
    val latest = post.groupBy(col("doc_id"))
      .agg(max(col(versionCol)).as(versionCol))
    post.join(latest, Seq("doc_id", versionCol), "left_semi")
      .groupBy("term", "doc_id").agg(sum("tf").as("tf"))
  }

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

  /** Per-document top-`k` keywords by the same linear-idf TF-IDF as
    * [[tfidfScores]] — deterministic keyword extraction (the
    * engine-side analog of the reference's LLM entity-keyword step,
    * src/rag.py's query prep): score = tf · (N + 1 − df), all-integer
    * so the ranking is exact and engine-portable; ties break on the
    * term. Returns (doc_id, term, score, rank), rank 1..k.
    *
    * Scale shape: df is one term-keyed aggregate over the postings
    * (exchange-free over a term-bucketed store), joined back on the
    * term (co-located, same bucketing), then ONE (doc_id)-keyed
    * window for the top-k — the partition is a document's distinct
    * terms, bounded by document length, so no skew exposure.
    */
  def keywords(post: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    post.join(docFreq(post), "term")
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("doc_id"), col("term"),
        (col("tf") * (col("n_docs") + 1 - col("df"))).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Best snippet window per matching document: the `window`-token
    * span with the MOST query-term occurrences, anchored at a matched
    * position (the search-result highlighting primitive, built on the
    * same positional postings as [[phraseMatch]]). For every matched
    * occurrence p the candidate span is [p, p+window); hits = matched
    * occurrences inside it; the per-doc best takes (hits desc, start
    * asc) — deterministic. Returns (doc_id, start, hits), one row per
    * doc containing ≥1 query term.
    *
    * Scale shape: the query-term filter pushes to the positional-
    * postings scan (term-pruned over a term-partitioned store); the
    * candidate join is a per-doc range self-join over MATCHED
    * occurrences only — bounded by a document's query-term hits,
    * never its length — and the final pick is one (doc_id)-keyed
    * aggregate-free window over candidate spans.
    */
  def snippetWindows(posPost: DataFrame, queryTerms: Seq[String],
      window: Int): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(window >= 1, s"window must be positive, got $window")
    val m = posPost.filter(col("term").isin(queryTerms: _*))
      .select(col("doc_id"), col("pos"))
    val cand = m.as("a").join(m.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") >= col("a.pos") &&
          col("b.pos") < col("a.pos") + window)
      .groupBy(col("a.doc_id").as("doc_id"), col("a.pos").as("start"))
      .agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("hits").desc, col("start").asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** [[tfidfScores]] with N folded in from the 1-row [[corpusStats]]
    * frame (broadcast cross-join) — no driver-side count in the query
    * path; the stats come from the stored index.
    */
  def tfidfScores(post: DataFrame, stats: DataFrame,
      queryTerms: Seq[String]): DataFrame = {
    val matched = post.filter(col("term").isin(queryTerms: _*))
    matched.join(broadcast(docFreq(matched)), "term")
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .groupBy("doc_id")
      .agg(sum(col("tf") * (col("n_docs") + 1 - col("df"))).as("score"))
  }

  /** Batch TF-IDF: scores for MANY queries in ONE plan — the
    * batch-serving / eval-harness retrieval path (one job for a
    * whole question set instead of a job per question; the batch
    * analog of [[tfidfScores]], same per-query df semantics).
    * `queries` is a (qid, term) frame, broadcast twice: once to
    * filter the postings scan (term-pruned when the index is
    * term-partitioned) and once to attach each query's own df. Two
    * corpus-sized exchanges: the (qid, term) window that derives df
    * (a hash(term) bucketing does NOT satisfy the (qid, term)
    * distribution, so this one is paid even over saveBucketed
    * postings) and the final (qid, doc_id) aggregate.
    * Returns (qid, doc_id, score); rank per qid downstream (window
    * for bounded candidate sets, Vectors.knnDotMany's salted
    * two-phase rank for giant fan-outs).
    */
  def tfidfScoresMany(post: DataFrame, stats: DataFrame,
      queries: DataFrame): DataFrame = {
    // dedupe defensively: a duplicated (qid, term) row would double
    // both tf and df, silently reordering top-k
    val q = queries.dropDuplicates("qid", "term")
    val matched = post.join(broadcast(q), Seq("term"))
    // df as a window over the matched rows — ONE pass over the
    // postings (a second aggregate-then-join would re-derive the
    // corpus-sized matched subtree, the d9 reused-subtree cost);
    // each (term, doc) appears once per qid, so the partition count
    // IS that query's df
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid", "term")
    matched
      .withColumn("df", count(lit(1)).over(w))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .groupBy("qid", "doc_id")
      .agg(sum(col("tf") * (col("n_docs") + 1 - col("df"))).as("score"))
  }

  /** BM25 (k1, b defaults 1.2/0.75): idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * tf_norm = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)). Double-precision;
    * the rank order is what matters at the API level. `stats` is the
    * 1-row [[corpusStats]] frame, cross-joined broadcast — the whole
    * score is one job with no driver-side scalar.
    */
  def bm25Scores(
      post: DataFrame, docLen: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val matched = post.filter(col("term").isin(queryTerms: _*))
    val withDf = matched.join(broadcast(docFreq(matched)), "term")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val tfn = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    withDf.join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(idf * tfn).as("score"))
  }

  /** Batch BM25: [[bm25Scores]] for MANY queries in ONE plan — the
    * batch-serving mirror of [[tfidfScoresMany]], and the scorer that
    * keeps batch serving CONSISTENT with the single-query BM25 path
    * (the reference's hybrid search is Tantivy BM25 + vector,
    * generate_note_embeddings.py:49 / rag.py:88 — a batch path fusing
    * tf-idf ranks would serve different orderings than the one-off
    * path). Same shape as the tf-idf batch: `queries` is a
    * (qid, term) frame broadcast against the postings, each query's
    * own df derived by the (qid, term) window in the SAME pass, doc
    * lengths joined in, (N, avgdl) folded from the broadcast 1-row
    * stats frame. Two corpus-sized exchanges, identical to
    * tfidfScoresMany. Per-query arithmetic is bm25Scores' exactly:
    * idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * tf_norm = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).
    * Returns (qid, doc_id, score); rank per qid downstream.
    */
  def bm25ScoresMany(post: DataFrame, docLen: DataFrame, stats: DataFrame,
      queries: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.dropDuplicates("qid", "term")
    val matched = post.join(broadcast(q), Seq("term"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid", "term")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val tfn = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    matched
      .withColumn("df", count(lit(1)).over(w))
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("qid", "doc_id")
      .agg(sum(idf * tfn).as("score"))
  }

  /** Boolean term query (the Tantivy `+must / -must_not` shape): docs
    * containing ALL `must` terms and NONE of `mustNot`. The must-side
    * intersection is ONE aggregate — count distinct matched terms per
    * doc = |must| — instead of m chained self-joins; the exclusion is
    * one anti join on doc_id. Both term filters push to the postings
    * scan (partition-pruned when the index is term-partitioned).
    * Returns (doc_id, tf_sum: total tf over the must terms — the
    * ranking input for a downstream scorer).
    */
  def booleanMatch(post: DataFrame, must: Seq[String],
      mustNot: Seq[String] = Seq.empty): DataFrame = {
    require(must.nonEmpty, "boolean query needs at least one must term")
    val matched = post.filter(col("term").isin(must: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("__nt"), sum("tf").as("tf_sum"))
      .filter(col("__nt") === must.distinct.length).drop("__nt")
    if (mustNot.isEmpty) matched
    else matched.join(
      post.filter(col("term").isin(mustNot: _*)).select("doc_id"),
      Seq("doc_id"), "left_anti")
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

  /** Per-query [[rrfFuse]]: both inputs carry (qid, id, rank); the
    * fusion joins on (qid, id) so a whole question batch fuses in
    * one plan. Same arithmetic and same default k as rrfFuse — the
    * single place the constant lives for the batch path.
    */
  def rrfFuseMany(a: DataFrame, b: DataFrame, k: Int = 60): DataFrame = {
    val ra = a.select(col("qid"), col("id"), col("rank").as("rank_a"))
    val rb = b.select(col("qid"), col("id"), col("rank").as("rank_b"))
    ra.join(rb, Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"),
        (coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0))).as("rrf"))
  }
}
