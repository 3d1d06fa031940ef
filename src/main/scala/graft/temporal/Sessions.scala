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

  /** Snapshot stream → SCD2 (slowly-changing-dimension type 2):
    * collapse consecutive runs of the same `attr` value per `key`
    * into validity intervals — the change-data-capture compaction a
    * warehouse runs over an event/snapshot feed. The sibling of
    * gaps-and-islands: segments break on VALUE CHANGE rather than
    * time gap.
    *
    * Output per (key, run): `seg` (ordinal), the run's `attr` value,
    * `valid_from` (first observation), `valid_to` (start of the NEXT
    * run; null for the current/open run), `n_events`.
    *
    * Mechanics: lag-compare (null-safe `<=>`, so a null attr value
    * forms runs like any other and row 1 always opens one) → running
    * sum of change flags = run id → one agg → lead() for the closing
    * bound. Two window passes + one agg, all partitioned by `key`:
    * a single shuffle's worth of distribution, no self-join. `tsUs`
    * must be a total order within key — pass (micros, event_id) via
    * `tie` when timestamps can collide.
    */
  def scd2(events: DataFrame, key: Column, tsUs: Column, tie: Column,
      attr: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__k").orderBy("__ts", "__tie")
    val byRun = Window.partitionBy("__k").orderBy("__seg")
    events
      .select(key.as("__k"), tsUs.as("__ts"), tie.as("__tie"), attr.as("__a"))
      .withColumn("__chg",
        // row 1 opens a run EXPLICITLY: a lag-only test would see
        // null <=> null when the first value is itself null and
        // zero-base that key's run ids
        when(row_number().over(w) === 1, 1L)
          .when(lag(col("__a"), 1).over(w) <=> col("__a"), 0L)
          .otherwise(1L))
      .withColumn("__seg", sum(col("__chg")).over(w))
      .groupBy(col("__k"), col("__seg"))
      .agg(min(col("__a")).as("__attr"),
        min(col("__ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .select(col("__k").as("key"), col("__seg").as("seg"),
        col("__attr").as("attr"), col("valid_from"),
        lead(col("valid_from"), 1).over(byRun).as("valid_to"),
        col("n_events"))
  }
}
