package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sample.Sampling
import graft.temporal.Sessions

/** Deterministic sampling + sessionization: the curation-stage
  * operators (SampleOps x1-x4). Determinism is the contract — every
  * assertion would fail under rand()-based sampling.
  */
class SamplingSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private lazy val docs = (0L until 1000L).map(i => (i, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("rateThreshold maps rates to 4-hex-digit bounds") {
    assert(Sampling.rateThreshold(0.0) === "0000")
    assert(Sampling.rateThreshold(0.25) === "4000")
    assert(Sampling.rateThreshold(1.0) === "zzzz", "rate 1.0 sorts after all hex")
    intercept[IllegalArgumentException] { Sampling.rateThreshold(1.5) }
  }

  test("bernoulli is deterministic, seed-sensitive, and near the rate") {
    val a = Sampling.bernoulli(docs, col("doc_id"), 0.3, "s").as[(Long, String)].collect().toSet
    val b = Sampling.bernoulli(docs, col("doc_id"), 0.3, "s").as[(Long, String)].collect().toSet
    assert(a === b, "same key+seed ⇒ same sample")
    val c = Sampling.bernoulli(docs, col("doc_id"), 0.3, "other").as[(Long, String)].collect().toSet
    assert(a !== c, "different seed ⇒ different sample")
    assert(math.abs(a.size - 300) < 60, s"got ${a.size} of expected ~300")
    assert(Sampling.bernoulli(docs, col("doc_id"), 1.0).count() === 1000)
    assert(Sampling.bernoulli(docs, col("doc_id"), 0.0).count() === 0)
  }

  test("mixture keeps per-source rates and drops unlisted sources") {
    val m = Sampling.mixture(docs, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.4), "s")
    val bySrc = m.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") === 250, "rate 1.0 keeps the whole source")
    assert(bySrc.get("src2").isEmpty && bySrc.get("src3").isEmpty,
      "sources outside the mixture are dropped")
    assert(math.abs(bySrc("src1") - 100) < 40)
  }

  test("stratified takes exactly min(n, |group|) rows per group, deterministically") {
    val s1 = Sampling.stratified(docs, Seq(col("source")), col("doc_id"), 7)
    val counts = s1.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(7L))
    val again = Sampling.stratified(docs, Seq(col("source")), col("doc_id"), 7)
    assert(s1.collect().toSet === again.collect().toSet)
    // quota above group size: the whole group survives
    val all = Sampling.stratified(docs, Seq(col("source")), col("doc_id"), 500)
    assert(all.count() === 1000)
  }

  test("weighted (A-Res) is deterministic, quota-exact, weight-sensitive") {
    import graft.sample.Sampling
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd",
        if (i <= 20) 1000.0 else 1.0))
    val df = rows.toDF("k", "grp", "w")
    val s1 = Sampling.weighted(df, Seq(col("grp")), col("k"), col("w"), 5, "s")
      .as[(Long, String, Double)].collect().toSet
    val s2 = Sampling.weighted(df, Seq(col("grp")), col("k"), col("w"), 5, "s")
      .as[(Long, String, Double)].collect().toSet
    assert(s1 === s2, "same seed draws the same sample")
    assert(s1.count(_._2 == "even") === 5 && s1.count(_._2 == "odd") === 5)
    // the 20 heavy rows (1000× weight, 5% of rows) should dominate:
    // each group's 10 heavy rows vs 190 light — P(light row beats a
    // heavy one) is tiny, so expect ≥4 of 5 heavy per group
    assert(s1.count(_._1 <= 20) >= 8, s"heavy rows must dominate: $s1")
    val s3 = Sampling.weighted(df, Seq(col("grp")), col("k"), col("w"), 5, "t")
      .as[(Long, String, Double)].collect().toSet
    assert(s1 !== s3, "a different seed draws a different sample")
    // null / non-positive weights are dropped, not jittered
    val bad = Seq((1L, "g", 0.0), (2L, "g", -1.0), (3L, "g", 2.0))
      .toDF("k", "grp", "w")
    val kept = Sampling.weighted(bad, Seq(col("grp")), col("k"), col("w"), 5)
      .as[(Long, String, Double)].collect().toSeq
    assert(kept === Seq((3L, "g", 2.0)))
  }

  test("split: exhaustive labeled partition, deterministic, near the fractions") {
    val df = (1L to 2000L).toDF("id")
    val out = Sampling.split(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet === Set("train", "val", "test"),
      "fractions summing to 1 leave no 'rest' rows")
    assert(out.values.sum === 2000L, "a split is a partition — no loss, no dup")
    assert(math.abs(out("train") - 1600.0) < 100, s"train ~80%: $out")
    assert(math.abs(out("val") - 200.0) < 60 && math.abs(out("test") - 200.0) < 60)
    // re-derivable: the same call reproduces identical membership
    val a = Sampling.split(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s")
      .as[(Long, String)].collect().toSet
    val b = Sampling.split(df.orderBy(col("id").desc), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s")
      .as[(Long, String)].collect().toSet
    assert(a === b, "membership is row-order independent")
    intercept[IllegalArgumentException] {
      Sampling.split(df, col("id"), Seq("a" -> 0.8, "a" -> 0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.split(df, col("id"), Seq("a" -> 0.8, "b" -> 0.5))
    }
  }

  test("tokenBudget keeps an exact hash-order prefix per source; " +
      "two-phase sum equals the flat definition") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = (1L to 200L).map(i =>
      (s"src${i % 3}", i, 10L + (i % 7))).toDF("src", "id", "toks")
    val out = Sampling.tokenBudget(docs, col("src"), col("id"), col("toks"),
        budget = 120L, seed = "t")
      .as[(String, Long, Long, Long)].collect()
    // flat reference: per source, order by (md5(id || seed), id),
    // running sum, keep while <= budget — the kept set is a PREFIX
    // (not a knapsack: a too-big row stops its source even if a later
    // smaller row would fit)
    val expected = (1L to 200L).map(i => (s"src${i % 3}", i, 10L + (i % 7)))
      .groupBy(_._1).flatMap { case (src, rows) =>
        var cum = 0L
        rows.sortBy { case (_, id, _) => (md5hex(id.toString + "t"), id) }
          .flatMap { case (_, id, t) =>
            cum += t
            if (cum <= 120L) Some((src, id, t, cum)) else None
          }
      }.toSet
    assert(out.toSet === expected)
    assert(out.nonEmpty && out.length < 200, "budget must actually cut")
    // determinism: second run identical
    val again = Sampling.tokenBudget(docs, col("src"), col("id"), col("toks"),
        budget = 120L, seed = "t")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again === out.toSet)
  }

  test("madOutliers: exact lower median/MAD, adaptive flag, degenerate MAD") {
    import graft.sample.Robust
    // group a: values 1..7 plus a wild 100 → med = 4 (lower median of
    // 8 values = rank 4), devs |v-4| sorted: 0,1,1,2,2,3,3,96 → MAD = 2
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }
    // group b: constant values → MAD = 0; only the deviant row flags
    val b = Seq(5.0, 5.0, 5.0, 9.0).zipWithIndex
      .map { case (v, i) => ("b", 100L + i, v) }
    val df = (a ++ b).toDF("g", "id", "v")
    val out = Robust.madOutliers(df, col("g"), col("id"), col("v"), k = 3.0)
      .as[(String, Long, Double, Double, Double, Boolean)].collect()
    val byId = out.map(r => r._2 -> r).toMap
    assert(byId(0L)._4 === 4.0 && byId(0L)._5 === 2.0, "group a med/MAD")
    assert(byId(7L)._6, "the wild value (dev 96 > 3*2) must flag")
    assert(a.indices.dropRight(1).forall(i => !byId(i.toLong)._6),
      "values within 3*MAD must not flag")
    assert(byId(100L)._5 === 0.0, "constant group has MAD 0")
    assert(byId(103L)._6 && !byId(100L)._6,
      "with MAD 0, only v != med flags (conventional degenerate reading)")
  }

  test("madOutliers: a hot group rides the value-frequency table — " +
      "rank windows scan distinct values, not rows") {
    import graft.sample.Robust
    // one group = 90% of all rows, but only 5 distinct values: the
    // skew shape that previously dragged 900 rows through one window
    // partition twice — now the windows see 5 frequency rows
    val hot = (0 until 900).map(i => ("hot", i.toLong, (i % 5).toDouble))
    val cold = (0 until 100).map(i => ("cold", 1000L + i, i.toDouble))
    val out = Robust.madOutliers((hot ++ cold).toDF("g", "id", "v"),
      col("g"), col("id"), col("v"), k = 3.0)
    // hot: values 0..4 ×180 → rank ceil(900/2)=450 → med 2; deviations
    // 0×180, 1×360, 2×360 → mad 1. cold: 0..99 → rank 50 → med 49,
    // devs of 0..99 around 49 → mad 25
    val stats = out.select("key", "med", "mad").distinct()
      .as[(String, Double, Double)].collect().toSet
    assert(stats === Set(("hot", 2.0, 1.0), ("cold", 49.0, 25.0)))
    // plan pin (r19): the rank-selection windows run EAGERLY inside
    // madOutliers, over the (key, v, n) value-frequency aggregate,
    // and only the GROUP-COUNT-sized med/mad checkpoints remain in
    // the returned plan — joins, no Window. The hot group's 900 rows
    // can never be dragged through a per-key window sort at read
    // time, and the corpus is scanned exactly once when the result
    // is consumed.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty,
      "rank selection must be pre-materialized, not re-planned in the read path")
  }

  test("sessionize merges events within the gap and splits across it") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (1L, ts("2026-01-01 10:10:00"), 2.0),
      (1L, ts("2026-01-01 11:30:00"), 4.0), // > 30 min after 10:10 ⇒ new session
      (2L, ts("2026-01-01 10:00:00"), 8.0)
    ).toDF("user_id", "ts", "value")
    val s = Sessions.sessionize(ev, col("user_id"), col("ts"), "30 minutes",
        Seq(sum("value").as("total")))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total"))
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(s === Set(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:40:00"), 2L, 3.0),
      (1L, ts("2026-01-01 11:30:00"), ts("2026-01-01 12:00:00"), 1L, 4.0),
      (2L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00"), 1L, 8.0)))
  }

  test("scd2 collapses value runs into validity intervals") {
    // user 1: A A B A — three runs; user 2: one open run of nulls
    val ev = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, Some("A")),
      (1L, 30L, 3L, Some("B")), (1L, 40L, 4L, Some("A")),
      (2L, 10L, 5L, None), (2L, 20L, 6L, None)
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.scd2(ev, col("user_id"), col("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Option[String], Long, Option[Long], Long)]
      .collect().toSet
    assert(got === Set(
      (1L, 1L, Some("A"), 10L, Some(30L), 2L),
      (1L, 2L, Some("B"), 30L, Some(40L), 1L),
      (1L, 3L, Some("A"), 40L, None, 1L),
      (2L, 1L, None, 10L, None, 2L)),
      "null attr forms a run like any value; last run per key stays open")
  }

  test("scd2 breaks ties deterministically via the tiebreaker column") {
    // two events share ts_us=10; event_id order decides the run layout
    val ev = Seq(
      (1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"), (1L, 20L, 3L, "A")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.scd2(ev, col("user_id"), col("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
    // order by (ts, event_id): A(id1), B(id2), A(id3) — three runs
    assert(got === Set(
      (1L, 1L, "A", 10L, Some(10L), 1L),
      (1L, 2L, "B", 10L, Some(20L), 1L),
      (1L, 3L, "A", 20L, None, 1L)))
  }
}
