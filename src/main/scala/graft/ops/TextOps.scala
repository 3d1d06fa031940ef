package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll
import graft.text.TextFunctions._

/** Text-analysis operator inventory over the `documents` table —
  * token counting, language-ID, quality scoring, fingerprinting
  * (training-data-pipeline surface; see graft.text.TextFunctions).
  *
  * Oracle SQL is generated from the SAME stopword constants and regex
  * patterns as the Spark side, so the two can't drift.
  */
object TextOps {

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB: count of tokens (with multiplicity) found in `set`. */
  private def sqlHits(toks: String, set: Seq[String]): String =
    s"len(list_filter($toks, t -> list_contains(${sqlList(set)}, t)))"

  private val sqlToks = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** DuckDB rendering of TextFunctions.langId over a `text` column —
    * shared with the composed-curation oracle (DedupOps d12).
    */
  private[ops] def sqlLangCase: String = {
    val en = sqlHits(sqlToks, stopwords("en"))
    val es = sqlHits(sqlToks, stopwords("es"))
    val fr = sqlHits(sqlToks, stopwords("fr"))
    val de = sqlHits(sqlToks, stopwords("de"))
    s"""CASE WHEN $en + $es + $fr + $de = 0 THEN 'und'
       |     WHEN $en >= $es AND $en >= $fr AND $en >= $de THEN 'en'
       |     WHEN $es >= $fr AND $es >= $de THEN 'es'
       |     WHEN $fr >= $de THEN 'fr'
       |     ELSE 'de' END""".stripMargin
  }

  /** DuckDB rendering of TextFunctions.qualityBucket — ditto. */
  private[ops] def sqlQualityCase: String = {
    val en = sqlHits(sqlToks, stopwords("en"))
    s"""CASE WHEN len($sqlToks) < 10 THEN 'too_short'
       |     WHEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
       |            / CAST(length(text) AS DOUBLE) > 0.1 THEN 'noisy'
       |     WHEN CAST($en AS DOUBLE) / CAST(len($sqlToks) AS DOUBLE) < 0.01 THEN 'unnatural'
       |     ELSE 'ok' END""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // T1 token counting: word tokens, distinct tokens, BPE-ish subword
    // count (cost estimation), chars. All per-row expressions: no
    // shuffle at any scale except the final presentation sort.
    QueryDef(
      "t1_token_count",
      (s, d) => orderedByAll(
        Tables.documents(s, d).select(
          col("doc_id"),
          size(tokens(col("text"))).as("n_tokens"),
          size(array_distinct(tokens(col("text")))).as("n_uniq"),
          size(subTokens(col("text"))).as("n_subtok"),
          length(col("text")).as("len"))),
      Some(s"""SELECT doc_id,
              |  len($sqlToks) AS n_tokens,
              |  len(list_distinct($sqlToks)) AS n_uniq,
              |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_subtok,
              |  length(text) AS len
              |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // T2 language-ID: stopword-profile classifier, reported as a
    // confusion matrix against the generator's lang label. (The
    // synthetic corpus is English-ish under every label, so accuracy
    // is not meaningful here — the matrix exercises the operator.)
    QueryDef(
      "t2_lang_id",
      (s, d) => {
        val toks = tokens(col("text"))
        orderedByAll(
          Tables.documents(s, d)
            .select(col("lang"), langId(col("text")).as("pred"))
            .groupBy("lang", "pred")
            .agg(count(lit(1)).as("n")))
      },
      Some(s"""SELECT lang,
              |  $sqlLangCase AS pred,
              |  count(*) AS n
              |FROM documents GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
    ),
    // T3 quality scoring: per-doc heuristic features + bucket, then a
    // per-(source,bucket) rollup. Ratios are single IEEE divisions of
    // exact ints — engine-portable bit-for-bit.
    QueryDef(
      "t3_quality_score",
      (s, d) => {
        val toks = tokens(col("text"))
        orderedByAll(
          Tables.documents(s, d)
            .select(
              col("source"),
              qualityBucket(tokenCount(col("text")), punctRatio(col("text")),
                stopwordRatio(col("text"))).as("bucket"))
            .groupBy("source", "bucket")
            .agg(count(lit(1)).as("n")))
      },
      Some(s"""SELECT source,
              |  $sqlQualityCase AS bucket,
              |  count(*) AS n
              |FROM documents GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
    ),
    // T4 winnowing fingerprint: min-md5 over 8-char shingles of the
    // normalized text; output per-doc. Pure map-side work.
    QueryDef(
      "t4_fingerprint",
      (s, d) => orderedByAll(
        Tables.documents(s, d)
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))),
      Some("""SELECT doc_id,
             |  list_min(list_transform(
             |    range(1, greatest(length(regexp_replace(lower(text), '\s+', ' ', 'g')) - 7, 1) + 1,
             |          1),
             |    i -> md5(substring(regexp_replace(lower(text), '\s+', ' ', 'g'), CAST(i AS INTEGER), 8)))) AS fp
             |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // T5 sequence packing: concat-and-chunk document → training-window
    // assignment, the offsets a tokenize-and-pack pipeline needs.
    // Packing runs PER SHARD (doc_id % nShards) — the scale-correct
    // shape: a global pack order is a single-partition window (the s4
    // trap), while per-shard packing is how real pipelines shard
    // output files anyway. Within a shard, docs pack in doc_id order:
    // start = running token sum, window = start div winSize, offset =
    // start % winSize. All exact-integer window arithmetic.
    QueryDef(
      "t5_seq_pack",
      (s, d) => {
        val W = 512
        val nShards = 8
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")
        orderedByAll(
          Tables.documents(s, d)
            .select(col("doc_id"), (col("doc_id") % nShards).as("shard"),
              size(tokens(col("text"))).as("n_tokens"))
            .withColumn("start", sum("n_tokens").over(w) - col("n_tokens"))
            .select(col("doc_id"), col("shard"),
              expr(s"start div $W").as("win"),
              expr(s"start % $W").as("off")))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, shard,
             |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
             |              - n_tokens AS BIGINT) AS start
             |  FROM t)
             |SELECT doc_id, shard, start // 512 AS win, start % 512 AS off
             |FROM p ORDER BY ALL""".stripMargin)
    ),
    // T6 repetition signals (Gopher-style duplicate-n-gram quality
    // filters, adapted to newline-free text): per-doc unique-token
    // fraction, the count of the most frequent bigram, and the
    // fraction of bigram occurrences belonging to repeated bigrams.
    // Two stacked aggregates keyed on doc_id — map-side partial
    // combine on (doc_id, bg), then a per-doc rollup: no window, no
    // array crosses a shuffle, skew bounded by per-doc bigram counts.
    // Fractions are single IEEE divisions of exact ints (portable).
    QueryDef(
      "t6_repetition",
      (s, d) => {
        val perBg = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .where(size(col("toks")) >= 2)
          .select(col("doc_id"),
            size(col("toks")).as("n_toks"),
            size(array_distinct(col("toks"))).as("n_uniq"),
            col("toks"),
            explode(bigramPositions(col("toks"))).as("__p"))
          .select(col("doc_id"), col("n_toks"), col("n_uniq"),
            bigramAt(col("toks"), col("__p")).as("bg"))
          .groupBy(col("doc_id"), col("bg"))
          .agg(count(lit(1)).as("n"),
            max(col("n_toks")).as("n_toks"), max(col("n_uniq")).as("n_uniq"))
        orderedByAll(
          perBg.groupBy("doc_id").agg(
            max(col("n_toks")).as("n_toks"),
            (max(col("n_uniq")).cast("double") /
              max(col("n_toks")).cast("double")).as("uniq_tok_frac"),
            max(col("n")).as("top_bg_n"),
            (sum(when(col("n") > 1, col("n")).otherwise(lit(0L))).cast("double") /
              sum(col("n")).cast("double")).as("dup_bg_frac")))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
              |f AS (SELECT doc_id, len(toks) AS n_toks,
              |             len(list_distinct(toks)) AS n_uniq,
              |             unnest(list_transform(range(1, len(toks)),
              |                                   i -> toks[i] || ' ' || toks[i+1])) AS bg
              |      FROM t WHERE len(toks) >= 2),
              |c AS (SELECT doc_id, bg, count(*) AS n,
              |             max(n_toks) AS n_toks, max(n_uniq) AS n_uniq
              |      FROM f GROUP BY 1, 2)
              |SELECT doc_id, max(n_toks) AS n_toks,
              |       CAST(max(n_uniq) AS DOUBLE) / CAST(max(n_toks) AS DOUBLE) AS uniq_tok_frac,
              |       max(n) AS top_bg_n,
              |       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
              |         / CAST(sum(n) AS DOUBLE) AS dup_bg_frac
              |FROM c GROUP BY 1 ORDER BY ALL""".stripMargin)
    ),
    // T7 corpus-wide vocabulary counting: top-100 bigrams by global
    // frequency — the count pass a BPE/vocab-building stage runs over
    // the whole corpus. Explode → partial-agg count (map-side combine
    // does the heavy lifting; the shuffle carries one row per
    // DISTINCT bigram per partition, not per occurrence) →
    // TakeOrdered top-k with the bigram string as the deterministic
    // tiebreaker at the cutoff.
    QueryDef(
      "t7_ngram_vocab",
      (s, d) => Tables.documents(s, d)
        .select(tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("toks"), explode(bigramPositions(col("toks"))).as("__p"))
        .select(bigramAt(col("toks"), col("__p")).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bg").asc)
        .limit(100),
      Some(s"""WITH t AS (SELECT $sqlToks AS toks FROM documents),
              |b AS (SELECT unnest(list_transform(range(1, len(toks)),
              |                                   i -> toks[i] || ' ' || toks[i+1])) AS bg
              |      FROM t WHERE len(toks) >= 2)
              |SELECT bg, count(*) AS n FROM b
              |GROUP BY 1 ORDER BY n DESC, bg LIMIT 100""".stripMargin)
    ),
    // T8 vocabulary-coverage filter (the CCNet-shaped signal with the
    // LM replaced by exact counting): per-doc fraction of token
    // occurrences OUTSIDE the corpus's top-50 unigrams. Pass 1 builds
    // the vocab (global count + TakeOrdered-50, tie-broken by token);
    // pass 2 re-derives per-doc token occurrences and left-semi-style
    // flags membership via a BROADCAST join against the 50-row vocab
    // — the corpus-sized side never shuffles on token; the only wide
    // exchange is the per-doc tally on doc_id. Exact-int fraction.
    QueryDef(
      "t8_oov_rate",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok").asc)
          .limit(50)
          .select(col("tok"), lit(1).as("in_vocab"))
        val occ = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        orderedByAll(
          occ.join(broadcast(vocab), Seq("tok"), "left_outer")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_toks"),
              sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_n"))
            .select(col("doc_id"), col("n_toks"), col("oov_n"),
              (col("oov_n").cast("double") /
                col("n_toks").cast("double")).as("oov_frac")))
      },
      Some(s"""WITH occ AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
              |vocab AS (SELECT tok FROM occ GROUP BY tok
              |          ORDER BY count(*) DESC, tok LIMIT 50)
              |SELECT doc_id, count(*) AS n_toks,
              |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_n,
              |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / CAST(count(*) AS DOUBLE) AS oov_frac
              |FROM occ LEFT JOIN vocab v USING (tok)
              |GROUP BY doc_id ORDER BY ALL""".stripMargin)
    ),
    // T9 bigram-LM cross-entropy (NgramLm.bigramCrossEntropy): the
    // CCNet-shaped quality signal with an actual language model — t8
    // stops at vocabulary membership; this scores every document's
    // surprise under the corpus's own add-one-smoothed bigram model.
    // The per-doc ln-sum is ORDER-DETERMINISTIC (position-sorted
    // array reduced left-to-right), so the doubles are bit-stable
    // across partitionings and the oracle replays them with an
    // ordered list_sum. Self-scored corpus ⇒ every bigram is in the
    // model, so the oracle's inner joins cover the left-join path's
    // self-score case (the unseen-text smoothing branch is
    // spec-pinned).
    QueryDef(
      "t9_bigram_xent",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // dumped rounded to 8 decimals: ln() is not correctly-rounded,
        // so engines disagree by ~1 ulp (the r3 BM25 precedent) — the
        // ORDER of the sum is already deterministic, only the
        // transcendental's last bit is engine-specific
        orderedByAll(
          graft.text.NgramLm.bigramCrossEntropy(docs, "doc_id", "text",
              docs, "text")
            .withColumn("xent", round(col("xent"), 8)))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS toks FROM documents),
              |bgp AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS pos, toks
              |        FROM toks WHERE len(toks) >= 2),
              |bg AS (SELECT doc_id, pos, toks[pos] || ' ' || toks[pos + 1] AS bg,
              |              toks[pos] AS w1 FROM bgp),
              |c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
              |uni AS (SELECT w1, count(*) AS c1
              |        FROM (SELECT unnest(toks) AS w1 FROM toks) GROUP BY 1),
              |v AS (SELECT count(*) AS v FROM uni),
              |sc AS (SELECT b.doc_id, b.pos,
              |         -ln(CAST(c12.c12 + 1 AS DOUBLE)
              |             / CAST(uni.c1 + v.v AS DOUBLE)) AS lnp
              |       FROM bg b JOIN c12 USING (bg) JOIN uni ON b.w1 = uni.w1, v),
              |agg AS (SELECT doc_id, list_sum(list(lnp ORDER BY pos)) AS s,
              |               count(*) AS n
              |        FROM sc GROUP BY 1)
              |SELECT doc_id, CAST(n AS INTEGER) AS n_bigrams,
              |       round(s / CAST(n AS DOUBLE), 8) AS xent
              |FROM agg ORDER BY ALL""".stripMargin)
    ),
    // T10 BPE merge learning (Bpe.learnMerges): the first two rounds
    // of byte-pair-encoding vocabulary training — count adjacent
    // symbol pairs weighted by word frequency, merge the argmax pair
    // everywhere (greedy left-to-right), repeat. All exact integer /
    // string arithmetic: ties break on (count desc, pair asc), and
    // the oracle replays round 1's counts, the greedy re-segmentation
    // (a recursive CTE folding the same merge), and round 2's argmax
    // — training is hash-checked, not just spec-pinned.
    QueryDef(
      "t10_bpe_merges",
      (s, d) => orderedByAll(
        graft.text.Bpe.learnMerges(Tables.documents(s, d), "text", rounds = 2)),
      Some(s"""WITH RECURSIVE
              |w AS (SELECT w, count(*) AS n FROM
              |        (SELECT unnest($sqlToks) AS w FROM documents) GROUP BY 1),
              |s1 AS (SELECT w, n, regexp_extract_all(w, '.') AS syms FROM w),
              |p1 AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
              |       FROM (SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
              |             FROM s1 WHERE len(syms) >= 2)
              |       GROUP BY 1, 2),
              |t1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
              |f1(w, n, pos, acc) AS (
              |  SELECT w, n, 1, [syms[1]] FROM s1
              |  UNION ALL
              |  SELECT f1.w, f1.n, pos + 1,
              |    CASE WHEN acc[len(acc)] = (SELECT a FROM t1)
              |           AND s1.syms[pos + 1] = (SELECT b FROM t1)
              |      THEN list_append(list_slice(acc, 1, len(acc) - 1),
              |                       (SELECT a || b FROM t1))
              |      ELSE list_append(acc, s1.syms[pos + 1]) END
              |  FROM f1 JOIN s1 USING (w) WHERE pos < len(s1.syms)),
              |s2 AS (SELECT f1.w, f1.n, acc AS syms
              |       FROM f1 JOIN s1 USING (w) WHERE pos = len(s1.syms)),
              |p2 AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
              |       FROM (SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
              |             FROM s2 WHERE len(syms) >= 2)
              |       GROUP BY 1, 2),
              |t2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1)
              |SELECT CAST(1 AS INTEGER) AS round, a, b, cnt FROM t1
              |UNION ALL
              |SELECT CAST(2 AS INTEGER) AS round, a, b, cnt FROM t2
              |ORDER BY ALL""".stripMargin)
    ),
    // T11 BPE segmentation APPLY (Bpe.tokenizeBpe) — the t1/t5
    // integration the training stage exists for: learn the first two
    // merges, segment the DISTINCT word table under them (vocab-sized,
    // broadcast back), and tokenize the corpus — per document, the
    // word-instance count and the BPE token count under the learned
    // segmentation. The oracle re-learns the same two merges (the t10
    // CTEs), folds BOTH greedy re-segmentations through recursive
    // CTEs, and re-counts — tokenization is hash-checked end to end.
    QueryDef(
      "t11_bpe_tokenize",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = graft.text.Bpe.learnMerges(docs, "text", rounds = 2)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq // 2 rows
        orderedByAll(
          graft.text.Bpe.tokenizeBpe(docs, "doc_id", "text", merges)
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_words"),
              sum(size(col("syms"))).as("n_tokens")))
      },
      Some(s"""WITH RECURSIVE
              |w AS (SELECT w, count(*) AS n FROM
              |        (SELECT unnest($sqlToks) AS w FROM documents) GROUP BY 1),
              |s1 AS (SELECT w, n, regexp_extract_all(w, '.') AS syms FROM w),
              |p1 AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
              |       FROM (SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
              |             FROM s1 WHERE len(syms) >= 2)
              |       GROUP BY 1, 2),
              |t1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
              |f1(w, n, pos, acc) AS (
              |  SELECT w, n, 1, [syms[1]] FROM s1
              |  UNION ALL
              |  SELECT f1.w, f1.n, pos + 1,
              |    CASE WHEN acc[len(acc)] = (SELECT a FROM t1)
              |           AND s1.syms[pos + 1] = (SELECT b FROM t1)
              |      THEN list_append(list_slice(acc, 1, len(acc) - 1),
              |                       (SELECT a || b FROM t1))
              |      ELSE list_append(acc, s1.syms[pos + 1]) END
              |  FROM f1 JOIN s1 USING (w) WHERE pos < len(s1.syms)),
              |s2 AS (SELECT f1.w, f1.n, acc AS syms
              |       FROM f1 JOIN s1 USING (w) WHERE pos = len(s1.syms)),
              |p2 AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
              |       FROM (SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
              |             FROM s2 WHERE len(syms) >= 2)
              |       GROUP BY 1, 2),
              |t2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
              |f2(w, pos, acc) AS (
              |  SELECT w, 1, [syms[1]] FROM s2
              |  UNION ALL
              |  SELECT f2.w, pos + 1,
              |    CASE WHEN acc[len(acc)] = (SELECT a FROM t2)
              |           AND s2.syms[pos + 1] = (SELECT b FROM t2)
              |      THEN list_append(list_slice(acc, 1, len(acc) - 1),
              |                       (SELECT a || b FROM t2))
              |      ELSE list_append(acc, s2.syms[pos + 1]) END
              |  FROM f2 JOIN s2 USING (w) WHERE pos < len(s2.syms)),
              |s3 AS (SELECT f2.w, len(acc) AS ntok
              |       FROM f2 JOIN s2 USING (w) WHERE pos = len(s2.syms)),
              |dt AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
              |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
              |               CAST(sum(ntok) AS BIGINT) AS n_tokens
              |        FROM dt JOIN s3 USING (w) GROUP BY 1)
              |SELECT * FROM agg ORDER BY ALL""".stripMargin)
    ),
    // T12 per-source KL divergence from the corpus unigram blend
    // (NgramLm.sourceKlDivergence) — the mixture-drift monitor for
    // x3/x12's per-source rates: add-one-smoothed p_s vs corpus q
    // over the full vocabulary grid (vocab × sources, sources
    // broadcast), summed in vocab order (the t9 order-stable fold)
    // and rounded to 8 decimals to absorb ln's engine last bit.
    QueryDef(
      "t12_source_kl",
      (s, d) => orderedByAll(
        graft.text.NgramLm.sourceKlDivergence(
          Tables.documents(s, d), "source", "text")),
      Some(s"""WITH tok AS (SELECT source, unnest($sqlToks) AS w FROM documents),
              |sw AS (SELECT source, w, count(*) AS n_sw FROM tok GROUP BY 1, 2),
              |st AS (SELECT source, CAST(sum(n_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
              |wt AS (SELECT w, CAST(sum(n_sw) AS BIGINT) AS n_w FROM sw GROUP BY 1),
              |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n,
              |               CAST(count(*) AS BIGINT) AS v FROM wt),
              |grid AS (SELECT st.source, wt.w, coalesce(sw.n_sw, 0) AS n_sw,
              |                st.n_s, wt.n_w, tot.n, tot.v
              |         FROM wt CROSS JOIN st
              |         LEFT JOIN sw ON sw.source = st.source AND sw.w = wt.w, tot),
              |terms AS (SELECT source, w, n_s,
              |            (CAST(n_sw + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE)) *
              |            ln((CAST(n_sw + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE)) /
              |               (CAST(n_w + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))) AS t
              |          FROM grid)
              |SELECT source, CAST(min(n_s) AS BIGINT) AS n_tokens,
              |       round(list_sum(list(t ORDER BY w)), 8) AS kl
              |FROM terms GROUP BY source ORDER BY ALL""".stripMargin)
    )
  )
}
