package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll
import graft.search.{Fts, Vectors}

/** Retrieval operator inventory (SURVEY §2.7): inverted index build,
  * TF-IDF / BM25 keyword search, and RRF hybrid fusion of keyword +
  * vector rankings — the engine's re-expression of the reference's
  * LanceDB hybrid search path (rag.py:85-103).
  */
object SearchOps {

  private val Query = Seq("spark", "join", "window")
  /** r7's question set: (qid, terms) — the batch-serving shape. */
  private val BatchQueries = Seq(
    1 -> Seq("spark", "join", "window"),
    2 -> Seq("hash", "merge", "sort"),
    3 -> Seq("vector", "stream"))
  private val Phrase = Seq("fast", "table")
  private val Must = Seq("spark", "join")
  private val MustNot = Seq("window")
  private val TopK = 20
  private val FuseK = 10
  private val RrfK = 60
  private val MinTermLen = 7  // keeps the r1 dump small; postings used
                              // for scoring are unfiltered

  private val sqlToks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private def sqlInList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared oracle CTEs: postings with tf, document frequency, N. */
  private val sqlPostCtes =
    s"""toks AS (SELECT doc_id, $sqlToks AS toks FROM documents),
       |post AS (SELECT doc_id, unnest(toks) AS term FROM toks),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY 1, 2)""".stripMargin

  /** The integer tf-idf ranked list as SQL (df computed over matched
    * terms only, mirroring Fts.tfidfScores).
    */
  private def sqlTfidfRanked(terms: Seq[String], limit: Int) =
    s"""matched AS (SELECT * FROM tf WHERE term IN ${sqlInList(terms)}),
       |mdf AS (SELECT term, count(*) AS df FROM matched GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT matched.doc_id, CAST(sum(matched.tf * (n.n + 1 - mdf.df)) AS BIGINT) AS score
       |  FROM matched JOIN mdf USING (term), n GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id, score,
       |         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM scored ORDER BY score DESC, doc_id ASC LIMIT $limit)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // R1 inverted-index build (S8): the index is a (term, doc_id, tf)
    // DataFrame — one explode + one partial-agg groupBy; written
    // partitioned by term hash at scale. Dump restricted to long terms
    // to keep the verify artifact small.
    QueryDef(
      "r1_inverted_index",
      (s, d) => orderedByAll(
        Fts.postings(Tables.documents(s, d), "doc_id", "text")
          .filter(length(col("term")) >= MinTermLen)),
      Some(
        s"""WITH $sqlPostCtes
           |SELECT term, doc_id, tf FROM tf WHERE length(term) >= $MinTermLen
           |ORDER BY ALL""".stripMargin)
    ),
    // R2 keyword search, integer tf-idf ranking (exact, portable).
    // N rides the broadcast stats frame — one job, no driver count.
    QueryDef(
      "r2_tfidf_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val post = Fts.postings(docs, "doc_id", "text")
        val stats = Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text"))
        Fts.tfidfScores(post, stats, Query)
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(TopK)
      },
      Some(
        s"""WITH $sqlPostCtes,
           |${sqlTfidfRanked(Query, TopK)}
           |SELECT doc_id, score FROM ranked""".stripMargin)
    ),
    // R3 BM25 top-k (V3): double-precision scores, emitted rounded —
    // ln() and sum-order ulps are engine-specific; ranking is stable.
    // The corpus stats (N, avgdl) ride a broadcast 1-row cross-join,
    // so the whole query is ONE job — no mid-plan driver action.
    QueryDef(
      "r3_bm25_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val post = Fts.postings(docs, "doc_id", "text")
        val dl = Fts.docLengths(docs, "doc_id", "text")
        Fts.bm25Scores(post, dl, Fts.corpusStats(dl), Query)
          .select(col("doc_id"), round(col("score"), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(TopK)
      },
      Some(
        s"""WITH $sqlPostCtes,
           |dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
           |stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM dl) AS avgdl FROM documents),
           |matched AS (SELECT * FROM tf WHERE term IN ${sqlInList(Query)}),
           |mdf AS (SELECT term, count(*) AS df FROM matched GROUP BY 1),
           |scored AS (
           |  SELECT m.doc_id,
           |         sum(ln(1.0 + (stats.n - mdf.df + 0.5) / (mdf.df + 0.5))
           |             * (m.tf * 2.2)
           |               / (m.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS s
           |  FROM matched m JOIN mdf USING (term) JOIN dl USING (doc_id), stats
           |  GROUP BY 1)
           |SELECT doc_id, round(s, 4) AS score FROM scored
           |ORDER BY score DESC, doc_id ASC LIMIT $TopK""".stripMargin)
    ),
    // R4 hybrid search + RRF (V4/V5): keyword tf-idf ranking fused
    // with vector dot-product ranking (doc_id ≡ vec_id in the corpus),
    // score = Σ 1/(60+rank) — the reference's RRFReranker semantics.
    QueryDef(
      "r4_rrf_hybrid",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val post = Fts.postings(docs, "doc_id", "text")
        val stats = Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text"))
        val kw = Fts.tfidfScores(post, stats, Query)
          .orderBy(col("score").desc, col("doc_id").asc).limit(TopK)
          .select(col("doc_id").as("id"),
            row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).as("rank"))
        val iv = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
        val q = iv.filter(col("vec_id") === 0).select(col("iv").as("qv"))
        val vec = Vectors.knnDot(iv, "vec_id", q, TopK)
          .select(col("vec_id").as("id"),
            row_number().over(Window.orderBy(col("dot").desc, col("vec_id").asc)).as("rank"))
        Fts.rrfFuse(kw, vec, RrfK)
          .orderBy(col("rrf").desc, col("id").asc)
          .limit(FuseK)
      },
      Some(
        s"""WITH $sqlPostCtes,
           |${sqlTfidfRanked(Query, TopK)},
           |iv AS (SELECT vec_id,
           |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
           |       FROM embeddings),
           |q AS (SELECT iv AS qv FROM iv WHERE vec_id = 0),
           |vdot AS (SELECT vec_id,
           |           CAST(list_sum(list_transform(range(1, len(iv) + 1, 1),
           |                                        i -> iv[i] * qv[i])) AS BIGINT) AS dot
           |         FROM iv, q),
           |vrank AS (SELECT vec_id AS id,
           |            row_number() OVER (ORDER BY dot DESC, vec_id ASC) AS rank
           |          FROM vdot ORDER BY dot DESC, vec_id ASC LIMIT $TopK)
           |SELECT coalesce(ranked.doc_id, vrank.id) AS id,
           |       coalesce(1.0 / ($RrfK + ranked.rank), 0.0)
           |         + coalesce(1.0 / ($RrfK + vrank.rank), 0.0) AS rrf
           |FROM ranked FULL OUTER JOIN vrank ON ranked.doc_id = vrank.id
           |ORDER BY rrf DESC, id ASC LIMIT $FuseK""".stripMargin)
    ),
    // R5 phrase search over positional postings (Tantivy-parity
    // capability the (term, doc_id, tf) schema discards): docs
    // containing the exact consecutive phrase, ranked by occurrence
    // count. The oracle replays the identical position-shift joins.
    QueryDef(
      "r5_phrase_topk",
      (s, d) => {
        val pp = Fts.positionalPostings(Tables.documents(s, d), "doc_id", "text")
        Fts.phraseMatch(pp, Phrase)
          .orderBy(col("phrase_tf").desc, col("doc_id").asc)
          .limit(TopK)
      },
      Some(
        s"""WITH toks AS (SELECT doc_id, $sqlToks AS toks FROM documents),
           |pos AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
           |               unnest(toks) AS term FROM toks),
           |${Phrase.zipWithIndex.map { case (t, i) =>
             s"m$i AS (SELECT doc_id, pos - $i AS pos FROM pos WHERE term = '$t')"
           }.mkString(",\n")},
           |hits AS (SELECT doc_id, count(*) AS phrase_tf FROM m0
           |         ${Phrase.indices.drop(1).map(i => s"JOIN m$i USING (doc_id, pos)").mkString(" ")}
           |         GROUP BY doc_id)
           |SELECT doc_id, phrase_tf FROM hits
           |ORDER BY phrase_tf DESC, doc_id ASC LIMIT $TopK""".stripMargin)
    ),
    // R6 boolean query (Tantivy +must/-must_not): all must terms
    // present, no excluded term — one count-distinct aggregate for
    // the intersection, one anti join for the exclusion.
    QueryDef(
      "r6_boolean_match",
      (s, d) => {
        val post = Fts.postings(Tables.documents(s, d), "doc_id", "text")
        orderedByAll(Fts.booleanMatch(post, Must, MustNot))
      },
      Some(
        s"""WITH $sqlPostCtes,
           |m AS (
           |  SELECT doc_id, count(DISTINCT term) AS nt,
           |         CAST(sum(tf) AS BIGINT) AS tf_sum
           |  FROM tf WHERE term IN ${sqlInList(Must)} GROUP BY doc_id),
           |ok AS (SELECT doc_id, tf_sum FROM m WHERE nt = ${Must.length})
           |SELECT doc_id, tf_sum FROM ok
           |WHERE doc_id NOT IN
           |  (SELECT doc_id FROM tf WHERE term IN ${sqlInList(MustNot)})
           |ORDER BY ALL""".stripMargin)
    ),
    // R7 batch retrieval: top-5 per question for a whole question
    // set in ONE plan (the eval-harness / batch-serving path —
    // compare r2, one job per question). Per-question df rides a
    // broadcast; the only corpus-sized shuffle is the (qid, doc_id)
    // aggregate; per-qid rank is a window over the bounded matched
    // set.
    QueryDef(
      "r7_batch_tfidf",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val qdf = BatchQueries.flatMap { case (q, ts) => ts.map(q -> _) }
          .toDF("qid", "term")
        val scored = Fts.tfidfScoresMany(
          Fts.postings(docs, "doc_id", "text"),
          Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text")), qdf)
        orderedByAll(scored
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("score").desc, col("doc_id").asc)))
          .filter(col("rank") <= 5))
      },
      Some {
        val values = BatchQueries
          .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
        s"""WITH $sqlPostCtes,
           |q(qid, term) AS (VALUES $values),
           |matched AS (SELECT q.qid, tf.doc_id, tf.term, tf.tf
           |            FROM tf JOIN q ON tf.term = q.term),
           |mdf AS (SELECT qid, term, count(*) AS df FROM matched GROUP BY 1, 2),
           |n AS (SELECT count(*) AS n FROM documents),
           |scored AS (
           |  SELECT m.qid, m.doc_id,
           |         CAST(SUM(m.tf * ((SELECT n FROM n) + 1 - mdf.df)) AS BIGINT) AS score
           |  FROM matched m JOIN mdf USING (qid, term) GROUP BY 1, 2),
           |ranked AS (
           |  SELECT qid, doc_id, score, row_number() OVER (
           |    PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
           |  FROM scored)
           |SELECT qid, doc_id, score, rank FROM ranked
           |WHERE rank <= 5 ORDER BY ALL""".stripMargin
      }
    ),
    // R8 batch HYBRID retrieval — the full serving path for a whole
    // question set in one plan: batch BM25 ranks (the reference's
    // hybrid keyword arm is Tantivy BM25, generate_note_embeddings
    // .py:49 — bm25ScoresMany keeps batch serving score-consistent
    // with the single-query r3 path) fused with batch exact-KNN ranks
    // (v4's salted two-phase top-k) via RRF, top-5 per question. Doc
    // ids ≡ vec ids in the corpus (the r4 contract); each query's
    // vector is its embeddings row.
    QueryDef(
      "r8_batch_hybrid",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val qdf = BatchQueries.flatMap { case (q, ts) => ts.map(q -> _) }
          .toDF("qid", "term")
        val dl = Fts.docLengths(docs, "doc_id", "text")
        val kw = Fts.bm25ScoresMany(
            Fts.postings(docs, "doc_id", "text"), dl, Fts.corpusStats(dl), qdf)
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("score").desc, col("doc_id").asc)))
          .filter(col("rank") <= TopK)
          .select(col("qid"), col("doc_id").as("id"), col("rank"))
        val iv = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
        val qs = iv.filter(col("vec_id").isin(BatchQueries.map(_._1): _*))
          .select(col("vec_id").as("qid"), col("iv").as("qv"))
        val vec = Vectors.knnDotMany(iv, "vec_id", qs, TopK)
          .select(col("qid"), col("vec_id").as("id"), col("rank"))
        orderedByAll(Fts.rrfFuseMany(kw, vec, RrfK)
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(col("rrf").desc, col("id").asc)))
          .filter(col("rank") <= FuseK))
      },
      Some {
        val values = BatchQueries
          .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
        val qidList = BatchQueries.map(_._1).mkString("(", ", ", ")")
        s"""WITH $sqlPostCtes,
           |bq(qid, term) AS (VALUES $values),
           |bmatched AS (SELECT bq.qid, tf.doc_id, tf.term, tf.tf
           |             FROM tf JOIN bq ON tf.term = bq.term),
           |bmdf AS (SELECT qid, term, count(*) AS df FROM bmatched GROUP BY 1, 2),
           |dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
           |stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM dl) AS avgdl FROM documents),
           |kscored AS (
           |  SELECT m.qid, m.doc_id,
           |         sum(ln(1.0 + (stats.n - bmdf.df + 0.5) / (bmdf.df + 0.5))
           |             * (m.tf * 2.2)
           |               / (m.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
           |  FROM bmatched m JOIN bmdf USING (qid, term) JOIN dl USING (doc_id), stats
           |  GROUP BY 1, 2),
           |ka AS (SELECT qid, doc_id AS id, rank FROM (
           |  SELECT qid, doc_id, row_number() OVER (
           |    PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
           |  FROM kscored) WHERE rank <= $TopK),
           |iv AS (SELECT vec_id,
           |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv
           |       FROM embeddings),
           |vq AS (SELECT vec_id AS qid, iv AS qv FROM iv WHERE vec_id IN $qidList),
           |vdot AS (SELECT vq.qid, iv.vec_id,
           |           CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |                                        i -> iv.iv[i] * vq.qv[i])) AS BIGINT) AS dot
           |         FROM iv, vq),
           |va AS (SELECT qid, vec_id AS id, rank FROM (
           |  SELECT qid, vec_id, row_number() OVER (
           |    PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rank
           |  FROM vdot) WHERE rank <= $TopK),
           |fused AS (
           |  SELECT coalesce(ka.qid, va.qid) AS qid, coalesce(ka.id, va.id) AS id,
           |         coalesce(1.0 / ($RrfK + ka.rank), 0.0)
           |           + coalesce(1.0 / ($RrfK + va.rank), 0.0) AS rrf
           |  FROM ka FULL OUTER JOIN va ON ka.qid = va.qid AND ka.id = va.id)
           |SELECT qid, id, rrf, rank FROM (
           |  SELECT qid, id, rrf, row_number() OVER (
           |    PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rank
           |  FROM fused) WHERE rank <= $FuseK ORDER BY ALL""".stripMargin
      }
    ),
    // R9 document chunking — the RAG/embedding ingestion stage:
    // overlapping 200-char windows every 150 chars, one row per
    // (doc_id, chunk_id) with the 1-based start offset and the chunk
    // text. Pure per-row expression arithmetic + explode: a map-only
    // pass at any scale, and the (doc_id, chunk_id) keys partition
    // freely into the downstream embed/index stages.
    QueryDef(
      "r9_chunk_windows",
      (s, d) => orderedByAll(
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.text.TextFunctions.chunkWindows(
              col("text"), win = 200, stride = 150)).as("c"))
          .select(col("doc_id"), col("c.chunk_id"), col("c.start"),
            col("c.chunk"))),
      Some("""WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
             |c AS (SELECT doc_id, text,
             |        unnest(generate_series(0,
             |          CAST(1 + floor((greatest(len - 200, 0) + 149) / 150) AS INTEGER) - 1)) AS chunk_id
             |      FROM t)
             |SELECT doc_id, chunk_id, chunk_id * 150 + 1 AS start,
             |       substring(text, CAST(chunk_id * 150 + 1 AS INTEGER), 200) AS chunk
             |FROM c ORDER BY ALL""".stripMargin)
    ),
    // R10 deterministic keyword extraction — per-doc top-3 TF-IDF
    // terms (the engine-side analog of the reference's LLM
    // entity-keyword query-prep step): linear idf over the FULL
    // postings df, all-integer scores, (score desc, term asc) ties.
    // One term-keyed df aggregate + one doc-keyed top-k window (the
    // window partition is a doc's distinct terms — bounded by doc
    // length, skew-free).
    QueryDef(
      "r10_keywords",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val post = Fts.postings(docs, "doc_id", "text")
        val stats = Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text"))
        orderedByAll(Fts.keywords(post, stats, k = 3))
      },
      Some(
        s"""WITH $sqlPostCtes,
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.term,
           |         CAST(tf.tf * (n.n + 1 - df.df) AS BIGINT) AS score
           |  FROM tf JOIN df USING (term), n)
           |SELECT doc_id, term, score, CAST(rank AS INTEGER) AS rank FROM (
           |  SELECT doc_id, term, score,
           |         row_number() OVER (PARTITION BY doc_id
           |                            ORDER BY score DESC, term ASC) AS rank
           |  FROM scored) WHERE rank <= 3 ORDER BY ALL""".stripMargin)
    ),
    // R11 snippet windows — search-result highlighting over the SAME
    // positional postings as phrase search: per matching doc, the
    // 20-token span (anchored at a matched occurrence) holding the
    // most query-term occurrences, ties to the earliest start. The
    // candidate join ranges only over MATCHED occurrences (bounded by
    // a doc's query hits, never its length).
    QueryDef(
      "r11_snippet_window",
      (s, d) => orderedByAll(
        Fts.snippetWindows(
          Fts.positionalPostings(Tables.documents(s, d), "doc_id", "text"),
          Query, window = 20)),
      Some(
        s"""WITH toks AS (SELECT doc_id, $sqlToks AS toks FROM documents),
           |pp AS (SELECT doc_id, unnest(toks) AS term,
           |              CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos
           |       FROM toks),
           |m AS (SELECT doc_id, pos FROM pp WHERE term IN ${sqlInList(Query)}),
           |cand AS (SELECT a.doc_id, a.pos AS start, count(*) AS hits
           |         FROM m a JOIN m b ON b.doc_id = a.doc_id
           |           AND b.pos >= a.pos AND b.pos < a.pos + 20
           |         GROUP BY 1, 2)
           |SELECT doc_id, start, hits FROM (
           |  SELECT doc_id, start, hits,
           |         row_number() OVER (PARTITION BY doc_id
           |                            ORDER BY hits DESC, start ASC) AS rn
           |  FROM cand) WHERE rn = 1 ORDER BY ALL""".stripMargin)
    )
  )
}
