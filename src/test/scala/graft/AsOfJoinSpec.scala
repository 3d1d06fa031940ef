package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.temporal.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, ts("2026-01-01 10:00:00"), "a"),
    (1L, ts("2026-01-01 12:00:00"), "b"),
    (2L, ts("2026-01-01 09:00:00"), "c"),   // before any right row
    (3L, ts("2026-01-01 10:30:00"), "d")    // key with no right rows
  ).toDF("k", "ts", "tag")

  private val right = Seq(
    (1L, ts("2026-01-01 09:30:00"), 10.0),
    (1L, ts("2026-01-01 11:00:00"), 20.0),
    (1L, ts("2026-01-01 12:00:00"), 30.0),  // exact-ts match for left 'b'
    (2L, ts("2026-01-01 09:30:00"), 99.0)
  ).toDF("k", "ts", "v")

  private lazy val result = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"))
    .select(col("tag"), col("v_asof")).as[(String, Option[Double])]
    .collect().toMap

  test("picks the most recent right row at or before each left ts") {
    assert(result("a") === Some(10.0))
  }

  test("exact-timestamp right rows count as matches") {
    assert(result("b") === Some(30.0), "ts-equal purchase must win over the 11:00 one")
  }

  test("left rows before any right row, or with unmatched keys, get null") {
    assert(result("c") === None)
    assert(result("d") === None)
  }

  test("rangeJoin: inclusive boundaries, no duplicate pairs across bins") {
    val l = Seq((1L, 1000L), (2L, 5000L)).toDF("lid", "ts_us")
    val r = Seq((10L, 0L), (11L, 2000L), (12L, 1000L), (13L, 9000L)).toDF("rid", "ts_us")
    val pairs = AsOfJoin.rangeJoin(l, r, "ts_us", 1000L)
      .select(col("lid"), col("r_rid")).as[(Long, Long)].collect()
    // boundary |Δ|=1000 is inclusive; each pair appears exactly once
    assert(pairs.length === pairs.distinct.length, "bin explode must not duplicate pairs")
    assert(pairs.toSet === Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("rangeJoin matches brute-force inequality join on real events") {
    val ev = graft.core.Tables.events(spark, sf)
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), unix_micros(col("ts")).as("ts_us"))
    val W = 300000000L
    val binned = AsOfJoin.rangeJoin(e, c, "ts_us", W)
      .select(col("event_id"), col("r_cid")).as[(Long, Long)].collect().toSet
    val brute = e.as("e").join(c.as("c"),
        abs(col("e.ts_us") - col("c.ts_us")) <= W)
      .select(col("e.event_id"), col("c.cid")).as[(Long, Long)].collect().toSet
    assert(binned === brute)
  }

  test("agrees with a brute-force theta-join + argmax formulation") {
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.k"), col("l.ts"), col("l.tag"))
          .orderBy(col("r.ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.tag"), col("r.v")).as[(String, Option[Double])]
      .collect().toMap
    assert(result === brute)
  }

  test("resampleFfill densifies to the grid and forward-fills per key") {
    val data = Seq((1L, 10L, 1.0), (1L, 25L, 2.0), (2L, 5L, 9.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.resampleFfill(data, "k", "t", Seq("v"),
        lit(0L), lit(30L), lit(10L))
      .orderBy("k", "t").as[(Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, 0L, None), (1L, 10L, Some(1.0)), (1L, 20L, Some(1.0)), (1L, 30L, Some(2.0)),
      (2L, 0L, None), (2L, 10L, Some(9.0)), (2L, 20L, Some(9.0)), (2L, 30L, Some(9.0))),
      "null before first observation; tick == observation time includes it")
  }
}
