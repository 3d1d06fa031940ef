package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning — the first rounds of byte-pair-encoding
  * vocabulary training, the tokenizer-construction stage of an LLM
  * data pipeline (t1/t5 COUNT tokens under a fixed segmentation;
  * this LEARNS the segmentation). Classic Sennrich BPE over the word
  * vocabulary: count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent pair everywhere (greedy
  * left-to-right), repeat.
  *
  * Scale shape: the corpus collapses to its word-frequency table
  * ONCE (one tokenize + one keyed count — the only corpus-sized
  * pass); every round after that works on the vocabulary-sized
  * symbol table: one pair-count aggregate (map-side combine), a
  * 1-row argmax to the driver (the learned merge IS driver state,
  * like a quantizer's centroids), and a re-segmentation projection.
  * Everything is exact integer/string arithmetic — no floats
  * anywhere — so ties break deterministically ((count desc, pair
  * asc)) and an oracle engine replays training round for round
  * (t10's DuckDB oracle folds the same greedy merge through a
  * recursive CTE).
  */
object Bpe {

  /** Greedy left-to-right application of merge (a, b) → "ab" to a
    * symbol-array column — the classic BPE fold: the accumulator's
    * last symbol merges with the incoming one when they match the
    * pair, else the symbol appends. A merged symbol never re-merges
    * with the NEXT occurrence ("a a a" → ["aa", "a"], not ["aa",
    * "aa…"]) because the comparison sees the merged text. Interpreted
    * HOF — acceptable by design: this runs over the vocabulary-sized
    * symbol table at training time, never on a corpus-sized scan.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts over a (n, syms) frame, weighted by `n`:
    * (a, b, cnt). One explode + one keyed aggregate.
    */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("syms")) >= 2)
      .select(col("n"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Learn the first `rounds` BPE merges of `docs`' text: seed every
    * vocabulary word as its character sequence, then per round take
    * the (count desc, a asc, b asc) argmax pair and re-segment.
    * Returns one row per learned merge: (round, a, b, cnt). The
    * re-segmented table checkpoints per round (vocabulary-sized) so
    * round r+1 never re-folds round r's lineage.
    *
    * One Spark job + driver round-trip PER ROUND — right for the
    * oracle-replayable few-round form; a real 32k-merge tokenizer
    * build uses [[learnMergesLocal]] (collect the bounded
    * word-frequency table once, fold all rounds driver-side — same
    * output, one corpus job total).
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    var syms = words.select(col("w"), col("n"),
        regexp_extract_all(col("w"), lit("."), lit(0)).as("syms"))
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"round $r: no pairs left to merge")
      val (a, b, c) = (top.head.getString(0), top.head.getString(1),
        top.head.getLong(2))
      learned += ((r, a, b, c))
      if (r < rounds)
        syms = syms.select(col("w"), col("n"),
            applyMerge(col("syms"), a, b).as("syms"))
          .localCheckpoint(true)
    }
    import spark.implicits._
    learned.result().toDF("round", "a", "b", "cnt")
  }

  /** Greedy left-to-right merge application, driver/executor-local —
    * the same fold as [[applyMerge]] in plain Scala (BpeSpec pins the
    * equivalence through segmentWords vs segmentWordsBulk).
    */
  private[text] def applyMergeLocal(s: Array[String], a: String,
      b: String): Array[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- s) {
      if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = a + b
      else acc += x
    }
    acc.toArray
  }

  /** The REAL-SCALE training path: collect the (bounded, vocab-sized)
    * word-frequency table ONCE and fold every merge round driver-side
    * — one corpus job total, instead of [[learnMerges]]'s one job +
    * driver round-trip per round. A 32k-merge tokenizer build is 32k
    * in-memory folds over the vocabulary, the same shape as every
    * production BPE trainer; the corpus-sized work (tokenize + word
    * count) stays distributed. Identical output to [[learnMerges]] —
    * same (count desc, a asc, b asc) argmax, same greedy
    * re-segmentation — BpeSpec pins the round-for-round equality.
    * `maxVocab` guards the driver collect (loud reject, never OOM).
    */
  def learnMergesLocal(docs: DataFrame, textCol: String, rounds: Int,
      maxVocab: Int = 10000000): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .limit(maxVocab + 1).collect()
    require(words.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab — raise it or use learnMerges")
    var syms: Array[(Array[String], Long)] =
      words.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, n) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + n
      require(counts.nonEmpty, s"round $r: no pairs left to merge")
      val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      learned += ((r, a, b, c))
      if (r < rounds)
        syms = syms.map { case (s, n) => (applyMergeLocal(s, a, b), n) }
    }
    import spark.implicits._
    learned.result().toDF("round", "a", "b", "cnt")
  }

  /** Segment a word table (`w` column) under an ORDERED merge list,
    * fully in-plan: char-split then one [[applyMerge]] fold per
    * merge. Returns (w, syms). Expression depth grows with the merge
    * count — right for oracle-checkable bounded lists (t11's 2
    * rounds); a 32k-merge tokenizer uses [[segmentWordsBulk]].
    */
  def segmentWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(col("w"),
        regexp_extract_all(col("w"), lit("."), lit(0)).as("syms"))) {
      case (df, (a, b)) => df.select(col("w"), applyMerge(col("syms"), a, b).as("syms"))
    }

  /** [[segmentWords]] for production-sized merge lists: a typed map
    * over the VOCAB-SIZED word table with the merge list broadcast —
    * per-partition imperative fold (the one place mapPartitions is
    * the right tool: 32k nested expressions won't compile, and the
    * input is the vocabulary, never the corpus). Same output as
    * segmentWords (BpeSpec pins it).
    */
  def segmentWordsBulk(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    words.select(col("w")).as[String].mapPartitions { it =>
      val ms = bc.value
      it.map { w =>
        var s = w.map(_.toString).toArray
        for ((a, b) <- ms) s = applyMergeLocal(s, a, b)
        (w, s.toSeq)
      }
    }.toDF("w", "syms")
  }

  /** Tokenize a corpus under learned merges — the t1/t5 integration:
    * the DISTINCT word table segments once (vocab-sized — in-plan
    * for bounded merge lists, [[segmentWordsBulk]] when `bulk`), and
    * the corpus rides one explode + one BROADCAST join on the word
    * (the corpus never shuffles, the t7/t8 vocab discipline).
    * Returns one row per word instance: (idCol, w, syms).
    */
  def tokenizeBpe(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], bulk: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
    val seg0 = toks.select(col("w")).distinct()
    val seg = if (bulk) segmentWordsBulk(seg0, merges) else segmentWords(seg0, merges)
    toks.join(broadcast(seg), Seq("w")).select(col(idCol), col("w"), col("syms"))
  }
}
