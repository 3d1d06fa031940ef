package graft

import org.apache.spark.sql.functions._

import graft.temporal.{Cdc, Sessions}

/** Snapshot-CDC primitives: diff classification, the apply∘diff
  * closure, and the SCD2 interval equivalence x9 rides.
  */
class CdcSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private lazy val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
  private lazy val b = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("k", "v")

  test("tableDiff classifies added / removed / changed; unchanged drop") {
    val d = Cdc.tableDiff(a, b, "k", "v")
      .as[(Long, Option[Double], Option[Double], String)].collect().toSet
    assert(d === Set(
      (1L, Some(10.0), None, "removed"),
      (3L, Some(30.0), Some(33.0), "changed"),
      (4L, None, Some(40.0), "added")))
  }

  test("applyDelta(a, tableDiff(a, b)) reproduces b exactly — the CDC closure") {
    val applied = Cdc.applyDelta(a, Cdc.tableDiff(a, b, "k", "v"), "k", "v")
      .as[(Long, Double)].collect().toSet
    assert(applied === b.as[(Long, Double)].collect().toSet)
    // identical snapshots → empty delta → apply is the identity
    val id = Cdc.applyDelta(a, Cdc.tableDiff(a, a, "k", "v"), "k", "v")
      .as[(Long, Double)].collect().toSet
    assert(id === a.as[(Long, Double)].collect().toSet)
  }

  test("null VALUES classify by key presence, and the closure still holds") {
    // k=1 changes 5.0 → null, k=2 changes null → 7.0, k=3 holds a
    // null unchanged, k=4 with null value is removed: presence, not
    // value nullness, must drive every classification
    val na = Seq((1L, Some(5.0)), (2L, None: Option[Double]),
      (3L, None: Option[Double]), (4L, None: Option[Double])).toDF("k", "v")
    val nb = Seq((1L, None: Option[Double]), (2L, Some(7.0)),
      (3L, None: Option[Double])).toDF("k", "v")
    val d = Cdc.tableDiff(na, nb, "k", "v")
      .as[(Long, Option[Double], Option[Double], String)].collect().toSet
    assert(d === Set(
      (1L, Some(5.0), None, "changed"),
      (2L, None, Some(7.0), "changed"),
      (4L, None, None, "removed")), "k=3 (null, unchanged) must not appear")
    val applied = Cdc.applyDelta(na, Cdc.tableDiff(na, nb, "k", "v"), "k", "v")
      .as[(Long, Option[Double])].collect().toSet
    assert(applied === nb.as[(Long, Option[Double])].collect().toSet)
  }

  test("SCD2 over the applied history equals SCD2 over the direct one") {
    val applied = Cdc.applyDelta(a, Cdc.tableDiff(a, b, "k", "v"), "k", "v")
    def hist(second: org.apache.spark.sql.DataFrame) =
      a.select(col("k"), lit(1L).as("t"), col("v"))
        .unionByName(second.select(col("k"), lit(2L).as("t"), col("v")))
    def intervals(h: org.apache.spark.sql.DataFrame) =
      Sessions.scd2(h, col("k"), col("t"), col("t"), col("v"))
        .as[(Long, Long, Double, Long, Option[Long], Long)].collect().toSet
    assert(intervals(hist(applied)) === intervals(hist(b)))
    // and the shape is right: k=3 changed → closed first interval
    val k3 = intervals(hist(applied)).filter(_._1 == 3L)
    assert(k3 === Set((3L, 1L, 30.0, 1L, Some(2L), 1L), (3L, 2L, 33.0, 2L, None, 1L)))
  }
}
