package graft.eval

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic slice of the reference's judge metrics (G6).
  * The LLM-judged metrics (Hallucination, AnswerRelevance, Moderation,
  * Usefulness — rag_obs_eval.py:388-394) are out of engine scope by
  * design; what IS engine-shaped:
  *
  *  - the Opik `Contains` metric (rag_obs_eval.py:256): substring
  *    presence of a reference string in an output, scored 1.0/0.0,
  *    case-insensitive by default;
  *  - the golden-answer harness's number↔word variant matching
  *    (test_graphrag.py:8-35): "3" and "three" are interchangeable
  *    when checking whether an expected value appears in an answer.
  *
  * Both are pure Column expressions, so scoring a million answers is
  * one codegen'd projection.
  */
object JudgeMetrics {

  /** test_graphrag.py NUMBER_WORDS (0..10). */
  val NumberWords: Seq[(String, String)] = Seq(
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9", "ten" -> "10")

  private def litMap(pairs: Seq[(String, String)]): Column =
    map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Opik Contains: 1.0 iff `reference` occurs in `output` as a
    * substring; case-insensitive unless `caseSensitive`.
    */
  def containsScore(output: Column, reference: Column,
      caseSensitive: Boolean = false): Column = {
    val (o, r) =
      if (caseSensitive) (output, reference) else (lower(output), lower(reference))
    when(o.contains(r), 1.0).otherwise(0.0)
  }

  /** `number_variants(s)` (test_graphrag.py:21-35): the lowered value
    * plus its digit↔word counterpart when one exists.
    */
  def numberVariants(s: Column): Column = {
    val l = lower(s)
    val counterpart = coalesce(
      element_at(litMap(NumberWords), l),
      element_at(litMap(NumberWords.map(_.swap)), l))
    filter(array(l, counterpart), _.isNotNull)
  }

  /** Does ANY variant of `expected` appear in the lowered answer —
    * the golden-answer assertion (test_graphrag.py:49-56).
    */
  def matchesExpected(answer: Column, expected: Column): Column =
    exists(numberVariants(expected), v => lower(answer).contains(v))
}
