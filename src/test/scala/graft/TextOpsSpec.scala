package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Bigram/repetition primitives behind t6_repetition and
  * t7_ngram_vocab (Gopher-style duplicate-n-gram quality signals and
  * the vocabulary-count stage).
  */
class TextOpsSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def bigramsOf(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(bigrams(tokens(col("text"))).as("bg"))
      .as[Seq[String]].collect().head

  test("bigrams: adjacent pairs, with multiplicity, in order") {
    assert(bigramsOf("the cat sat on the cat") ===
      Seq("the cat", "cat sat", "sat on", "on the", "the cat"))
  }

  test("bigrams: short and empty docs yield empty, never error") {
    assert(bigramsOf("word") === Seq.empty)
    assert(bigramsOf("") === Seq.empty)
    assert(bigramsOf("!!!") === Seq.empty, "no alnum tokens at all")
  }

  test("repetition fractions on a crafted doc (hand-computed)") {
    // "a b a b a b" — tokens 6, uniq 2; bigrams: "a b"×3, "b a"×2
    // (5 total, all repeated) ⇒ top=3, dup_frac=1.0, uniq_frac=2/6
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        explode(bigrams(col("toks"))).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("n"), max("n_toks").as("n_toks"),
        max("n_uniq").as("n_uniq"))
      .groupBy("doc_id")
      .agg(max("n_toks").as("n_toks"),
        (max(col("n_uniq")).cast("double") /
          max(col("n_toks")).cast("double")).as("uniq_frac"),
        max("n").as("top_n"),
        (sum(when(col("n") > 1, col("n")).otherwise(lit(0L))).cast("double") /
          sum(col("n")).cast("double")).as("dup_frac"))
      .as[(Long, Int, Double, Long, Double)].collect().head
    assert(df === ((1L, 6, 2.0 / 6.0, 3L, 1.0)))
  }

  private def chunksOf(text: String, win: Int, stride: Int): Seq[(Int, Int, String)] =
    Seq(text).toDF("text")
      .select(explode(chunkWindows(col("text"), win, stride)).as("c"))
      .select("c.chunk_id", "c.start", "c.chunk")
      .as[(Int, Int, String)].collect().toSeq

  test("chunkWindows: overlap arithmetic and last-window clamp") {
    // 10 chars, win 4, stride 3 ⇒ 1 + ceil(6/3) = 3 chunks
    assert(chunksOf("abcdefghij", 4, 3) === Seq(
      (0, 1, "abcd"), (1, 4, "defg"), (2, 7, "ghij")))
    // 11 chars ⇒ ceil(7/3) = 3 extra; last is a 2-char tail
    assert(chunksOf("abcdefghijk", 4, 3) === Seq(
      (0, 1, "abcd"), (1, 4, "defg"), (2, 7, "ghij"), (3, 10, "jk")))
  }

  test("chunkWindows: short and empty text yield exactly one chunk") {
    assert(chunksOf("ab", 4, 3) === Seq((0, 1, "ab")))
    assert(chunksOf("abcd", 4, 3) === Seq((0, 1, "abcd")), "len == win ⇒ 1 chunk")
    assert(chunksOf("", 4, 3) === Seq((0, 1, "")))
  }

  test("chunkWindows rejects invalid window geometry") {
    intercept[IllegalArgumentException] { chunkWindows(col("t"), 4, 5) }
    intercept[IllegalArgumentException] { chunkWindows(col("t"), 0, 1) }
  }

  test("BPE applyMerge is greedy left-to-right and non-cascading") {
    import graft.text.Bpe
    def apply1(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), a, b).as("m"))
        .as[Seq[String]].head()
    assert(apply1(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(apply1(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(apply1(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(apply1(Seq("b", "a", "a"), "a", "a") === Seq("b", "aa"))
    assert(apply1(Seq("x"), "a", "b") === Seq("x"), "no pair, no change")
    // a merged symbol compares as its merged TEXT: ("aa","a") after
    // an (a,a) merge round is a DIFFERENT pair than (a,a)
    assert(apply1(Seq("aa", "a", "a"), "a", "a") === Seq("aa", "aa"))
  }

  test("learnMerges reproduces hand-computed BPE rounds") {
    import graft.text.Bpe
    // words: aaab ×2, ab ×1. Round 1: (a,a)=4 beats (a,b)=3 → merge.
    // Re-segmented: [aa,a,b]×2, [a,b]. Round 2: (a,b)=3 beats (aa,a)=2.
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges === Seq((1, "a", "a", 4L), (2, "a", "b", 3L)))
  }

  test("learnMergesLocal (one-collect driver fold) equals learnMerges round for round") {
    import graft.text.Bpe
    val docs = Seq((1L, "aaab ab banana bandana"), (2L, "aaab banana")).toDF("doc_id", "text")
    val dist = Bpe.learnMerges(docs, "text", rounds = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val local = Bpe.learnMergesLocal(docs, "text", rounds = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(local === dist)
    intercept[IllegalArgumentException] {
      Bpe.learnMergesLocal(docs, "text", rounds = 1, maxVocab = 2)
    }
  }

  test("segmentWordsBulk (typed-map 32k path) equals in-plan segmentWords") {
    import graft.text.Bpe
    val words = Seq("aaab", "ab", "banana", "x", "aabb").toDF("w")
    val merges = Seq(("a", "a"), ("a", "b"), ("an", "a"))
    val inPlan = Bpe.segmentWords(words, merges)
      .as[(String, Seq[String])].collect().toMap
    val bulk = Bpe.segmentWordsBulk(words, merges)
      .as[(String, Seq[String])].collect().toMap
    assert(bulk === inPlan)
    assert(inPlan("aaab") === Seq("aa", "ab"))
    assert(inPlan("x") === Seq("x"))
  }

  test("tokenizeBpe rides a broadcast join on the vocab — the corpus never shuffles") {
    import graft.text.Bpe
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = Bpe.tokenizeBpe(docs, "doc_id", "text", Seq(("a", "a"), ("a", "b")))
    val rows = out.as[(Long, String, Seq[String])].collect().toSet
    assert(rows === Set(
      (1L, "aaab", Seq("aa", "ab")), (1L, "ab", Seq("ab")),
      (2L, "aaab", Seq("aa", "ab"))))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
  }

  test("sourceKlDivergence: non-negative, near-zero for corpus-like sources, " +
      "large for off-distribution ones") {
    import graft.text.NgramLm
    val docs = Seq(
      ("a", "the cat sat on the mat"),
      ("b", "the cat sat on the mat"),     // b ≡ a ≡ half the blend
      ("c", "zq zq zq zq zq zq")           // c: disjoint vocabulary
    ).toDF("source", "text")
    val kl = NgramLm.sourceKlDivergence(docs, "source", "text")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(kl.keySet === Set("a", "b", "c"))
    assert(kl("a")._1 === 6L && kl("c")._1 === 6L)
    assert(kl.values.forall(_._2 >= 0.0), "KL is non-negative")
    assert(kl("a")._2 === kl("b")._2, "identical sources score identically")
    assert(kl("c")._2 > kl("a")._2,
      "a disjoint-vocabulary source must sit farther from the blend " +
        "(add-one smoothing on this 18-token corpus compresses the gap)")
  }

  test("bigramCrossEntropy: add-one smoothing scores UNSEEN text against a model") {
    import graft.text.NgramLm
    // model vocab: {the, cat, sat, ran} → V = 4
    val model = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val scored = NgramLm.bigramCrossEntropy(
      Seq((10L, "the cat sat"), (11L, "zebra quux")).toDF("doc_id", "text"),
      "doc_id", "text", model, "text")
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // doc 10: (the cat): c12=2, c1(the)=2 → -ln(3/6);
    //         (cat sat): c12=1, c1(cat)=2 → -ln(2/6)
    val exp10 = (-math.log(3.0 / 6) + -math.log(2.0 / 6)) / 2
    assert(math.abs(scored(10L) - exp10) < 1e-12)
    // doc 11: fully unseen — c12=0, c1=0 → -ln(1/V) per bigram
    val exp11 = -math.log(1.0 / 4)
    assert(math.abs(scored(11L) - exp11) < 1e-12)
    // unseen text scores strictly WORSE (higher surprise)
    assert(scored(11L) > scored(10L))
  }
}
