package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event sessionization — the gaps-and-islands operator: events of
  * the same user closer than `gap` merge into one session. Built on
  * Spark's native `session_window`, so the SAME expression runs in
  * batch (here) and in Structured Streaming with a watermark
  * (StreamingSpec proves it) — the engine's batch/stream unification
  * story for behavioral training data.
  *
  * Scale shape: one shuffle on the user key; session merging is the
  * aggregation itself (no self-join, no window-lag pass). Session
  * end is Spark's convention: last event + gap.
  */
object Sessions {

  /** Sessions per `user`: (user, session_start, session_end,
    * n_events, plus `aggs`). `gap` is a calendar-interval string
    * ("30 minutes").
    */
  def sessionize(events: DataFrame, user: Column, ts: Column, gap: String,
      aggs: Seq[Column] = Seq.empty): DataFrame = {
    val firstAgg +: restAggs = (count(lit(1)).as("n_events") +: aggs): @unchecked
    events
      .groupBy(user, session_window(ts, gap).as("__w"))
      .agg(firstAgg, restAggs: _*)
      .withColumn("session_start", col("__w.start"))
      .withColumn("session_end", col("__w.end"))
      .drop("__w")
  }
}
