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
}
