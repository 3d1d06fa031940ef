package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.{QueryDef, Skew, Tables}
import graft.core.Tables.orderedByAll
import graft.temporal.AsOfJoin

/** Scale-technique operator inventory: as-of join (union+window
  * composition of an operator Spark lacks, checked against DuckDB's
  * native ASOF JOIN) and salted skew aggregation (two-phase
  * decomposable agg, result ≡ plain GROUP BY).
  */
object ScaleOps {

  /** Two deterministic snapshot versions synthesized from orders
    * (shared by j11 and x9): v1 lacks keys ≡0 mod 7 → those classify
    * "added"; v2 lacks keys ≡0 mod 3 → "removed"; v2 doubles prices
    * on keys ≡0 mod 5 → "changed" (×2 is a power of two, so the
    * doubled doubles are exact). Every diff branch populated.
    */
  private def snapV1(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
  private def snapV2(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .where(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")).as("v"))

  val defs: Seq[QueryDef] = Seq(
    // J8 as-of join: for every click, the user's most recent purchase
    // at-or-before it. One shuffle + per-partition sort — never the
    // quadratic inequality-join formulation. Timestamps emitted as
    // unix micros (determinism rule: no raw TIMESTAMP outputs).
    QueryDef(
      "j8_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"),
            unix_micros(col("ts")).as("pts_us"))
        orderedByAll(
          AsOfJoin.asOf(clicks, purchases, "user_id", "ts",
              Seq("value", "pts_us"))
            .select(col("event_id"), col("user_id"),
              unix_micros(col("ts")).as("ts_us"),
              col("value_asof").as("last_purchase"),
              col("pts_us_asof").as("last_purchase_us")))
      },
      Some("""WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, ts, value, epoch_us(ts) AS pts_us
             |           FROM events WHERE event_type = 'purchase')
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |       r.value AS last_purchase, r.pts_us AS last_purchase_us
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY ALL""".stripMargin)
    ),
    // J9 range join (no equi-key): for every error event, how many
    // click events across ALL users fall within ±5 minutes. Bin
    // blocking turns the inequality join into an equi join on the
    // time bucket (3x left blowup, linear — never a nested loop).
    QueryDef(
      "j9_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(unix_micros(col("ts")).as("ts_us"))
        val W = 300000000L // 5 min in micros
        orderedByAll(
          AsOfJoin.rangeJoin(errors, clicks, "ts_us", W)
            .groupBy("event_id")
            .agg(count(lit(1)).as("n_nearby_clicks")))
      },
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error'),
             |     c AS (SELECT epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
             |SELECT e.event_id, count(*) AS n_nearby_clicks
             |FROM e JOIN c ON abs(e.ts_us - c.ts_us) <= 300000000
             |GROUP BY e.event_id ORDER BY ALL""".stripMargin)
    ),
    // A10 salted skew aggregation: event_type is a hot key (5 values
    // over the whole table — exactly the shape that starves a shuffle);
    // the salted two-phase plan spreads each key over 16 sub-keys and
    // must produce the identical result as a plain GROUP BY (the
    // oracle IS the plain GROUP BY).
    QueryDef(
      "a10_salted_skew_agg",
      (s, d) => orderedByAll(
        Skew.saltedSumCount(
            Tables.events(s, d)
              .withColumn("v", col("value").cast(DecimalType(18, 2))),
            "event_type", "v", "event_id", nSalts = 16)
          .select(col("event_type"),
            col("sum_v").cast(DoubleType).as("total"), col("n"))),
      Some("""SELECT event_type,
             |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |       count(*) AS n
             |FROM events GROUP BY event_type ORDER BY ALL""".stripMargin)
    ),
    // J10 salted equi-join: event_type is the same 5-value hot key as
    // a10; the salted plan spreads each key over 16 (key, salt)
    // sub-keys with the dim side exploded per salt, and must produce
    // the identical result as the plain join (the oracle IS the
    // plain join).
    QueryDef(
      "j10_salted_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("label", upper(col("event_type")))
        orderedByAll(
          Skew.saltedJoin(
              ev.filter(col("user_id") < 20).select("event_id", "event_type"),
              dim, "event_type", "event_id", nSalts = 16)
            .select("event_id", "label"))
      },
      Some("""WITH dim AS (
             |  SELECT DISTINCT event_type, upper(event_type) AS label FROM events)
             |SELECT e.event_id, d.label
             |FROM events e JOIN dim d USING (event_type)
             |WHERE e.user_id < 20 ORDER BY ALL""".stripMargin)
    ),
    // X5 resample + forward fill: per-user 6-hour grid over the
    // events month, each tick carrying the most recent value at-or-
    // before it (null before the first observation). Integer-micros
    // grid on BOTH engines so nanosecond event timestamps cannot
    // straddle a tick differently; oracle = generate_series + native
    // ASOF LEFT JOIN.
    QueryDef(
      "x5_resample_ffill",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
        orderedByAll(
          AsOfJoin.resampleFfill(ev, "user_id", "ts_us", Seq("value"),
              lit(1704067200000000L), lit(1706637600000000L), lit(21600000000L))
            .select(col("user_id"), col("ts_us"), col("value_asof").as("v")))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
             |g AS (SELECT unnest(generate_series(1704067200000000, 1706637600000000, 21600000000)) AS ts_us),
             |grid AS (SELECT u.user_id, g.ts_us FROM u CROSS JOIN g),
             |e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events WHERE user_id < 5)
             |SELECT grid.user_id, grid.ts_us, e.value AS v
             |FROM grid ASOF LEFT JOIN e ON grid.user_id = e.user_id AND grid.ts_us >= e.ts_us
             |ORDER BY ALL""".stripMargin)
    ),
    // S6 scalable row index: the zipWithIndex-over-sorted-partitions
    // path (no single-partition window — compare s4_row_index, which
    // pins the same semantics THROUGH the window form). doc_id is
    // unique, so the index is total and deterministic; the oracle is
    // the window the plan deliberately avoids.
    QueryDef(
      "s6_sorted_row_index",
      (s, d) => orderedByAll(
        graft.core.GraftKeys.sortedRowIndex(
          Tables.documents(s, d).select("doc_id"), Seq(col("doc_id")))),
      Some("""SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rid
             |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // J11 table diff — the CDC delta between two snapshot versions:
    // full outer join on the key, rows classified added / removed /
    // changed (value inequality on the compared column) with
    // unchanged rows dropped. The versions are synthesized
    // deterministically from orders (v1 lacks keys ≡0 mod 7 → those
    // classify "added"; v2 lacks keys ≡0 mod 3 → "removed"; v2
    // doubles prices on keys ≡0 mod 5 → "changed"; ×2 is a power of
    // two, so the doubled doubles are exact), populating every
    // branch. One shuffle on the key; the classification is a
    // codegen'd CASE.
    QueryDef(
      "j11_table_diff",
      (s, d) => orderedByAll(
        graft.temporal.Cdc.tableDiff(snapV1(s, d), snapV2(s, d), "k", "v")
          .select(col("k"), col("v_old").as("v1"), col("v_new").as("v2"),
            col("change"))),
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS v1
             |            FROM orders WHERE o_orderkey % 7 <> 0),
             |v2 AS (SELECT o_orderkey AS k,
             |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
             |              ELSE o_totalprice END AS v2
             |       FROM orders WHERE o_orderkey % 3 <> 0),
             |d AS (SELECT coalesce(v1.k, v2.k) AS k, v1.v1, v2.v2,
             |        CASE WHEN v1.v1 IS NULL THEN 'added'
             |             WHEN v2.v2 IS NULL THEN 'removed'
             |             WHEN v1.v1 <> v2.v2 THEN 'changed' END AS change
             |      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
             |SELECT k, v1, v2, change FROM d
             |WHERE change IS NOT NULL ORDER BY ALL""".stripMargin)
    ),
    // X6 snapshot → SCD2: per-user event_type runs compacted into
    // validity intervals (valid_to = next run's start, null while
    // open) — the CDC/warehouse compaction operator; the value-change
    // sibling of x4's time-gap islands. Integer-micros bounds with
    // event_id as the tiebreaker, so interval edges are
    // engine-portable and tie-stable. All passes partition on
    // user_id: one distribution, two windows, one agg.
    QueryDef(
      "x6_scd2",
      (s, d) => orderedByAll(
        graft.temporal.Sessions.scd2(
            Tables.events(s, d), col("user_id"),
            unix_micros(col("ts")), col("event_id"), col("event_type"))
          .select(col("key").as("user_id"), col("seg"),
            col("attr").as("event_type"),
            col("valid_from").as("valid_from_us"),
            col("valid_to").as("valid_to_us"),
            col("n_events"))),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
             |           FROM events),
             |o AS (SELECT user_id, us, event_id, event_type,
             |        CASE WHEN row_number() OVER w = 1 THEN 1
             |             WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
             |             THEN 1 ELSE 0 END AS chg
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |s AS (SELECT user_id, us, event_type,
             |        CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
             |      FROM o),
             |g AS (SELECT user_id, seg, min(event_type) AS event_type,
             |             min(us) AS valid_from_us, count(*) AS n_events
             |      FROM s GROUP BY 1, 2)
             |SELECT user_id, seg, event_type, valid_from_us,
             |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to_us,
             |       n_events
             |FROM g ORDER BY ALL""".stripMargin)
    ),
    // X9 CDC round-trip: the pipeline closure j11 + x6 imply but
    // never prove together — snapshot v1, diff against v2
    // (Cdc.tableDiff), APPLY the delta back onto v1 (Cdc.applyDelta),
    // and build SCD2 validity intervals from the (v1@t1, applied@t2)
    // history. The Spark side rides the APPLIED snapshot while the
    // oracle computes intervals from v2 DIRECTLY — so the hash only
    // matches if apply∘diff is the identity v1→v2, key for key and
    // value for value. Removed keys keep their t1 interval open on
    // both sides (snapshot-history semantics: absence is not an
    // observation).
    QueryDef(
      "x9_cdc_roundtrip",
      (s, d) => {
        val base = snapV1(s, d)
        val delta = graft.temporal.Cdc.tableDiff(base, snapV2(s, d), "k", "v")
        val applied = graft.temporal.Cdc.applyDelta(base, delta, "k", "v")
        val hist = base.select(col("k"), lit(1L).as("t"), col("v"))
          .unionByName(applied.select(col("k"), lit(2L).as("t"), col("v")))
        orderedByAll(
          graft.temporal.Sessions.scd2(hist, col("k"), col("t"), col("t"), col("v"))
            .select(col("key").as("k"), col("seg"), col("attr").as("v"),
              col("valid_from"), col("valid_to"), col("n_events")))
      },
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS v
             |            FROM orders WHERE o_orderkey % 7 <> 0),
             |v2 AS (SELECT o_orderkey AS k,
             |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
             |              ELSE o_totalprice END AS v
             |       FROM orders WHERE o_orderkey % 3 <> 0),
             |hist AS (SELECT k, CAST(1 AS BIGINT) AS t, v FROM v1
             |         UNION ALL SELECT k, CAST(2 AS BIGINT) AS t, v FROM v2),
             |o AS (SELECT k, t, v,
             |        CASE WHEN row_number() OVER w = 1 THEN 1
             |             WHEN lag(v) OVER w IS DISTINCT FROM v THEN 1 ELSE 0 END AS chg
             |      FROM hist WINDOW w AS (PARTITION BY k ORDER BY t)),
             |s AS (SELECT k, t, v,
             |        CAST(sum(chg) OVER (PARTITION BY k ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
             |      FROM o),
             |g AS (SELECT k, seg, min(v) AS v, min(t) AS valid_from,
             |             count(*) AS n_events
             |      FROM s GROUP BY 1, 2)
             |SELECT k, seg, v, valid_from,
             |       lead(valid_from) OVER (PARTITION BY k ORDER BY seg) AS valid_to,
             |       n_events
             |FROM g ORDER BY ALL""".stripMargin)
    )
  )
}
