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
}
