package graft

import org.apache.spark.sql.functions._

import graft.search.Fts

class FtsSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join spark spark"),
    (2L, "spark window aggregate"),
    (3L, "rare unicorn token spark"),
    (4L, "completely unrelated words here")
  ).toDF("doc_id", "text")

  test("postings: tf counted per (term, doc)") {
    val p = Fts.postings(docs, "doc_id", "text")
    val m = p.as[(String, Long, Long)].collect()
      .map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(m(("spark", 1L)) === 3L)
    assert(m(("spark", 2L)) === 1L)
    assert(!m.contains(("unicorn", 1L)))
  }

  test("tfidf: doc with more matched occurrences ranks higher") {
    val post = Fts.postings(docs, "doc_id", "text")
    val scored = Fts.tfidfScores(post, 4L, Seq("spark"))
      .as[(Long, Long)].collect().toMap
    assert(scored(1L) > scored(2L), "tf=3 beats tf=1 at equal df")
    assert(!scored.contains(4L), "non-matching doc absent")
  }

  test("compactPostings (additive): chunked-ingest deltas sum to the full-text index") {
    // doc 1's text arrives in two chunks — the one case summing is
    // correct for
    val chunks = Seq((1L, "spark shuffle"), (1L, "join spark spark"))
      .toDF("doc_id", "text")
    val compacted = Fts.compactPostings(
        Fts.postings(chunks, "doc_id", "text"))
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    val full = Fts.postings(
        Seq((1L, "spark shuffle join spark spark")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(compacted === full)
  }

  test("compactPostings (versioned): re-ingest is last-write-wins, tf never inflates") {
    val post = Fts.postings(docs, "doc_id", "text").withColumn("batch", lit(0L))
    // doc 1 re-ingested with NEW text in a later batch
    val reingest = Fts.postings(
        Seq((1L, "spark only now")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("batch", lit(1L))
    val compacted = Fts.compactPostings(post.unionAll(reingest), "batch")
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    val batchIdx = Fts.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    // every surviving doc-1 row comes from the re-ingest, verbatim
    assert(compacted(("spark", 1L)) === 1L && compacted(("only", 1L)) === 1L)
    assert(!compacted.contains(("shuffle", 1L)), "old doc-1 postings replaced")
    // all other docs: exactly the batch index, no inflation anywhere
    assert(compacted.filter(_._1._2 != 1L) === batchIdx.filter(_._1._2 != 1L))
  }

  test("compactPostings (versioned): a chunk-ingested surviving version still merges") {
    // doc 1's LATEST version itself arrives as two additive chunks —
    // the surviving rows must merge to one row per (term, doc)
    val v0 = Fts.postings(Seq((1L, "old text")).toDF("doc_id", "text"),
      "doc_id", "text").withColumn("batch", lit(0L))
    val v1chunks = Seq((1L, "spark shuffle"), (1L, "join spark spark"))
      .toDF("doc_id", "text")
    val v1 = Fts.postings(v1chunks, "doc_id", "text").withColumn("batch", lit(1L))
    val compacted = Fts.compactPostings(v0.unionAll(v1), "batch")
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    val full = Fts.postings(
        Seq((1L, "spark shuffle join spark spark")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(String, Long, Long)].collect().map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(compacted === full, "surviving version's chunks merge; v0 fully replaced")
  }

  test("tfidfScoresMany: each qid's scores equal the single-query form") {
    val post = Fts.postings(docs, "doc_id", "text")
    val stats = Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text"))
    val queries = Seq(
      1 -> Seq("spark"), 2 -> Seq("window", "unicorn"), 3 -> Seq("absent"))
    val qdf = queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("qid", "term")
    val batch = Fts.tfidfScoresMany(post, stats, qdf)
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(x => x._2 -> x._3).toMap }
    for ((q, terms) <- queries) {
      val single = Fts.tfidfScores(post, stats, terms)
        .as[(Long, Long)].collect().toMap
      assert(batch.getOrElse(q, Map.empty) === single,
        s"qid $q batch scores must equal the single-query scores")
    }
  }

  test("bm25ScoresMany: each qid's scores equal the single-query bm25Scores") {
    val post = Fts.postings(docs, "doc_id", "text")
    val dl = Fts.docLengths(docs, "doc_id", "text")
    val stats = Fts.corpusStats(dl)
    val queries = Seq(
      1 -> Seq("spark"), 2 -> Seq("window", "unicorn"), 3 -> Seq("absent"))
    val qdf = queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("qid", "term")
    val batch = Fts.bm25ScoresMany(post, dl, stats, qdf)
      .as[(Int, Long, Double)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(x => x._2 -> x._3).toMap }
    for ((q, terms) <- queries) {
      val single = Fts.bm25Scores(post, dl, stats, terms)
        .as[(Long, Double)].collect().toMap
      val b = batch.getOrElse(q, Map.empty)
      assert(b.keySet === single.keySet, s"qid $q doc sets must match")
      for ((id, s) <- single)
        assert(math.abs(b(id) - s) < 1e-12,
          s"qid $q doc $id: batch ${b(id)} vs single $s")
    }
  }

  test("bm25: rarer term contributes more than common term at equal tf") {
    val post = Fts.postings(docs, "doc_id", "text")
    val dl = Fts.docLengths(docs, "doc_id", "text")
    val stats = Fts.corpusStats(dl)
    // 'unicorn' df=1 vs 'spark' df=3: doc3 contains both once.
    val rare = Fts.bm25Scores(post, dl, stats, Seq("unicorn"))
      .as[(Long, Double)].collect().toMap
    val common = Fts.bm25Scores(post, dl, stats, Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(rare(3L) > common(3L))
    assert(common.keySet === Set(1L, 2L, 3L))
  }

  test("corpusStats: one row, n_docs and token-average length") {
    val (n, avgdl) = Fts.corpusStats(Fts.docLengths(docs, "doc_id", "text"))
      .as[(Long, Double)].head()
    assert(n === 4L)
    assert(math.abs(avgdl - (5 + 3 + 4 + 4) / 4.0) < 1e-12)
  }

  test("phraseMatch counts consecutive occurrences, incl. overlap") {
    val pdocs = Seq(
      (1L, "big data big data processing"), // "big data" x2
      (2L, "data big"),                     // reversed — no match
      (3L, "a a a"),                        // self-overlapping phrase
      (4L, "big data")
    ).toDF("doc_id", "text")
    val pp = Fts.positionalPostings(pdocs, "doc_id", "text")
    val m = Fts.phraseMatch(pp, Seq("big", "data"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L, 4L -> 1L))
    val overlap = Fts.phraseMatch(pp, Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(overlap === Map(3L -> 2L), "overlapping matches both count")
  }

  test("keywords: per-doc top-k by integer tf-idf, rare terms win, term tiebreak") {
    val kdocs = Seq(
      (1L, "apple apple banana common"),  // apple tf2 df1, banana tf1 df2, common tf1 df3
      (2L, "banana common"),
      (3L, "common cherry")
    ).toDF("doc_id", "text")
    val post = Fts.postings(kdocs, "doc_id", "text")
    val stats = Fts.corpusStats(Fts.docLengths(kdocs, "doc_id", "text"))
    val kw = Fts.keywords(post, stats, k = 2)
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._4).map(r => (r._2, r._3)).toSeq }
    // N=3, idf = N+1-df: apple df1→3, banana df2→2, common df3→1,
    // cherry df1→3. doc1: apple 2·3=6, banana 1·2=2, common 1
    assert(kw(1L) === Seq(("apple", 6L), ("banana", 2L)))
    // doc2: banana 2 beats common 1
    assert(kw(2L) === Seq(("banana", 2L), ("common", 1L)))
    // doc3: cherry df1 → 3; common 1
    assert(kw(3L) === Seq(("cherry", 3L), ("common", 1L)))
  }

  test("snippetWindows: densest window wins, earliest start breaks ties") {
    val sdocs = Seq(
      // hits at pos 0, 10, 12: window 5 anchored at 10 covers {10,12}
      // (2 hits) — beats the lone hit at 0
      (1L, "spark x x x x x x x x x spark y spark z"),
      (2L, "nothing matches here"),
      // two equal 1-hit windows → earliest anchor (pos 1) wins
      (3L, "a spark b c d e f g h i j k l m n o p q r s t spark")
    ).toDF("doc_id", "text")
    val pp = Fts.positionalPostings(sdocs, "doc_id", "text")
    val out = Fts.snippetWindows(pp, Seq("spark"), window = 5)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(1L -> ((10, 2L)), 3L -> ((1, 1L))),
      "doc 2 has no hits and must be absent")
  }

  test("booleanMatch: all must terms required, any mustNot excludes") {
    val post = Fts.postings(docs, "doc_id", "text")
    // must spark+join → only doc 1; doc 2 has spark but not join
    val and = Fts.booleanMatch(post, Seq("spark", "join"))
      .as[(Long, Long)].collect().toMap
    assert(and === Map(1L -> 4L), "doc1: spark tf 3 + join tf 1")
    // exclusion: spark docs minus those containing window
    val not = Fts.booleanMatch(post, Seq("spark"), Seq("window"))
      .as[(Long, Long)].collect().toMap.keySet
    assert(not === Set(1L, 3L), "doc2 excluded by 'window'")
    // duplicate must terms don't break the intersection count
    assert(Fts.booleanMatch(post, Seq("spark", "spark"))
      .as[(Long, Long)].collect().toMap.keySet === Set(1L, 2L, 3L))
  }

  test("rrf: membership in both lists beats membership in one") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val b = Seq((10L, 2), (12L, 1)).toDF("id", "rank")
    val f = Fts.rrfFuse(a, b).as[(Long, Double)].collect().toMap
    assert(f(10L) > f(11L) && f(10L) > f(12L))
    assert(math.abs(f(10L) - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(f(12L) - 1.0 / 61) < 1e-15)
  }

  test("rrf is symmetric in its input lists") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val b = Seq((10L, 2), (12L, 1)).toDF("id", "rank")
    val ab = Fts.rrfFuse(a, b).as[(Long, Double)].collect().toMap
    val ba = Fts.rrfFuse(b, a).as[(Long, Double)].collect().toMap
    assert(ab === ba)
  }
}
