package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll

/** Relational operator inventory — SURVEY.md §2.1 (scans), §2.2
  * (projection/filter), §2.3 (string/date functions), §2.4 (joins),
  * §2.5 (aggregations), §2.6 (windows/sorts/set ops).
  *
  * Each entry is an idiomatic-Spark declarative plan (Catalyst handles
  * pushdown, pruning, broadcast selection, AQE) paired with the DuckDB
  * oracle SQL. Determinism rules used throughout:
  *   - money sums go through DECIMAL(18,2): exact, order-independent,
  *     then cast back to DOUBLE for a stable comparable value;
  *   - every query ends with a total ORDER BY over all output columns
  *     (ORDER BY ALL on the DuckDB side);
  *   - no raw TIMESTAMP outputs (parquet ns vs us precision) — dates are
  *     formatted to strings or years.
  */
object Relational {

  /** Exact, order-independent sum of a double money column. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  val defs: Seq[QueryDef] = Seq(
    // ---- §2.1 scans / sources --------------------------------------
    QueryDef(
      "s1_scan_project",
      (s, d) => orderedByAll(
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 500)
          .select("l_orderkey", "l_partkey", "l_quantity")),
      Some("""SELECT l_orderkey, l_partkey, l_quantity
             |FROM lineitem WHERE l_orderkey < 500 ORDER BY ALL""".stripMargin)
    ),
    // S4 row index / surrogate key (reference create_dataset.py:8).
    // NOTE: a global row_number needs a single-partition sort; at 100 TB
    // use graft.core.GraftKeys.sortedRowIndex (zipWithIndex over the
    // range-partitioned sort — ScaleSpec proves it emits identical
    // indices) — this query pins the *semantics* for the oracle.
    QueryDef(
      "s4_row_index",
      (s, d) => orderedByAll(
        Tables.documents(s, d)
          .select("doc_id")
          .withColumn("rid", row_number().over(Window.orderBy("doc_id")))),
      Some("""SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rid
             |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // S5 multi-file concat + global sort (reference concatenate_json.py:19-77):
    // union-all keeps duplicates from overlapping batches.
    QueryDef(
      "s5_union_sort",
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        orderedByAll(
          o.filter(col("o_orderkey") < 1000)
            .unionAll(o.filter(col("o_orderkey").between(500, 1500))))
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 1000
             |UNION ALL
             |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey BETWEEN 500 AND 1500
             |ORDER BY ALL""".stripMargin)
    ),

    // ---- §2.2 projection / filter / scalar expressions ---------------
    QueryDef(
      "p1_project_rename",
      (s, d) => orderedByAll(
        Tables.customer(s, d).select(
          col("c_custkey").as("cust_id"),
          lower(col("c_mktsegment")).as("segment"),
          length(col("c_name")).as("name_len"))),
      Some("""SELECT c_custkey AS cust_id, lower(c_mktsegment) AS segment,
             |       length(c_name) AS name_len
             |FROM customer ORDER BY ALL""".stripMargin)
    ),
    // P2/P3 struct field access & unnest — events.props JSON parsed to a
    // struct, field projected out (reference build_graph.py:101-103).
    QueryDef(
      "p2_struct_field",
      (s, d) => orderedByAll(
        Tables.events(s, d)
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
          .select(col("event_type"), col("j.k").as("k_val"))
          .groupBy("event_type")
          .agg(sum("k_val").as("k_sum"), count(lit(1)).as("n"))),
      Some("""SELECT event_type, CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
             |       count(*) AS n
             |FROM events GROUP BY event_type ORDER BY ALL""".stripMargin)
    ),
    // P4/P5 null-predicate + all-null-row filter (reference
    // build_graph.py:139,197): nulls manufactured via CASE, rows kept if
    // ANY of the guarded columns is non-null.
    QueryDef(
      "p5_null_guard_filter",
      (s, d) => {
        val c = Tables.customer(s, d)
          .withColumn("bal_pos", when(col("c_acctbal") > 2000, col("c_acctbal")))
          .withColumn("seg_m", when(col("c_mktsegment") === "MACHINERY", col("c_mktsegment")))
        orderedByAll(
          c.filter(col("bal_pos").isNotNull || col("seg_m").isNotNull)
            .select(
              col("c_custkey"),
              coalesce(col("seg_m"), lit("other")).as("seg"),
              coalesce(col("bal_pos"), lit(-1.0)).as("bal")))
      },
      Some("""SELECT c_custkey,
             |       coalesce(CASE WHEN c_mktsegment='MACHINERY' THEN c_mktsegment END, 'other') AS seg,
             |       coalesce(CASE WHEN c_acctbal > 2000 THEN c_acctbal END, -1.0) AS bal
             |FROM customer
             |WHERE (CASE WHEN c_acctbal > 2000 THEN c_acctbal END) IS NOT NULL
             |   OR (CASE WHEN c_mktsegment='MACHINERY' THEN c_mktsegment END) IS NOT NULL
             |ORDER BY ALL""".stripMargin)
    ),
    // P6 range slice on a timestamp column — filter reaches the parquet
    // scan as a pushed predicate (check .explain: PushedFilters).
    QueryDef(
      "p6_range_slice",
      (s, d) => orderedByAll(
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01"))
            && col("l_shipdate") < to_timestamp(lit("1997-01-01")))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),
      Some(s"""SELECT l_returnflag, count(*) AS n, ${DSUM.format("l_quantity")} AS sum_qty
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              |GROUP BY l_returnflag ORDER BY ALL""".stripMargin)
    ),
    // P8/P9/P10 conditional + coalesce + literal; F1/F4 lower/concat_ws.
    QueryDef(
      "p8_case_expr",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .select(
            when(col("o_totalprice") > 300000, lit("big"))
              .when(col("o_totalprice") > 100000, lit("mid"))
              .otherwise(lit("small")).as("bucket"),
            concat_ws("_", lower(col("o_orderstatus")), col("o_orderpriority")).as("tag"),
            col("o_totalprice"))
          .groupBy("bucket", "tag")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),
      Some(s"""SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
              |            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
              |       concat_ws('_', lower(o_orderstatus), o_orderpriority) AS tag,
              |       count(*) AS n, ${DSUM.format("o_totalprice")} AS total
              |FROM orders GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
    ),

    // ---- §2.3 string / date functions --------------------------------
    // F1/F2/F3/F6: lower, regexp_replace (all-occurrences — DuckDB needs
    // the 'g' flag to match Spark's default), length, contains.
    QueryDef(
      "f2_string_funcs",
      (s, d) => orderedByAll(
        Tables.customer(s, d)
          .filter(col("c_mktsegment").contains("URN"))
          .select(
            col("c_custkey"),
            regexp_replace(lower(col("c_name")), "0+", "0").as("cname"),
            length(col("c_name")).as("len"))),
      Some("""SELECT c_custkey, regexp_replace(lower(c_name), '0+', '0', 'g') AS cname,
             |       length(c_name) AS len
             |FROM customer WHERE c_mktsegment LIKE '%URN%' ORDER BY ALL""".stripMargin)
    ),
    // F5 array split / slice / join (reference build_graph.py:103).
    QueryDef(
      "f5_array_join",
      (s, d) => orderedByAll(
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 5), "-").as("head5"))),
      Some("""SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], '-') AS head5
             |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // F7/F8 timestamp truncation + formatting (reference
    // build_graph.py:181-187 normalizes to UTC; session TZ is UTC here).
    QueryDef(
      "f7_date_ops",
      (s, d) => orderedByAll(
        Tables.events(s, d)
          .select(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("h"),
            col("event_type"), col("value"))
          .groupBy("h", "event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS h, event_type,
              |       count(*) AS n, ${DSUM.format("value")} AS v
              |FROM events GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
    ),

    // ---- §2.4 joins ---------------------------------------------------
    // J1 equi inner join, dimension side broadcast (at 100 TB the
    // customer dim still broadcasts or AQE converts; the fact side never
    // shuffles for the join itself).
    QueryDef(
      "j1_join_inner",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),
      Some(s"""SELECT c_mktsegment, count(*) AS n, ${DSUM.format("o_totalprice")} AS total
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY ALL""".stripMargin)
    ),
    // J2 key-matched edge build: dedup staging THEN join (shrink before
    // shuffle, reference WITH DISTINCT before MERGE, build_graph.py:214).
    QueryDef(
      "j2_edge_build",
      (s, d) => orderedByAll(
        Tables.customer(s, d)
          .select(col("c_custkey").as("src"), col("c_nationkey").as("dst"))
          .dropDuplicates("src", "dst")
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("dst"))), Seq("dst"))
          .select("src", "dst")),
      Some("""SELECT DISTINCT c_custkey AS src, n_nationkey AS dst
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY ALL""".stripMargin)
    ),
    // J3 multi-hop chain (graph pattern as joins): region→nation→customer→orders.
    QueryDef(
      "j3_multihop",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))),
      Some(s"""SELECT r_name, count(*) AS n_orders, ${DSUM.format("o_totalprice")} AS revenue
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name ORDER BY ALL""".stripMargin)
    ),
    // Left anti join (MERGE-idempotence analog, SURVEY §2.4 note).
    QueryDef(
      "j6_anti_join",
      (s, d) => orderedByAll(
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d).filter(col("o_totalprice") > 400000)
              .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |ORDER BY ALL""".stripMargin)
    ),
    QueryDef(
      "j7_semi_join",
      (s, d) => orderedByAll(
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d).filter(col("o_totalprice") > 450000)
              .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
             |ORDER BY ALL""".stripMargin)
    ),

    // ---- §2.5 aggregations --------------------------------------------
    // A1 full group-agg (TPC-H Q1 shape): partial/final hash agg, no
    // extra shuffle beyond the groupBy.
    QueryDef(
      "a1_group_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        orderedByAll(
          li.groupBy("l_returnflag", "l_linestatus").agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))
              * (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
              .cast(DoubleType).as("sum_disc_price"),
            count(lit(1)).as("n_rows")))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY ALL""".stripMargin)
    ),
    QueryDef(
      "a2_count_distinct",
      (s, d) => orderedByAll(
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("nparts"),
            countDistinct(col("l_suppkey")).as("nsupps"))),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nparts,
             |       count(DISTINCT l_suppkey) AS nsupps
             |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)
    ),
    // A4 group-by count + HAVING (golden query 1 shape, test_data.py:7-9).
    QueryDef(
      "a4_having",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 18)),
      Some("""SELECT o_custkey, count(*) AS n FROM orders
             |GROUP BY o_custkey HAVING count(*) >= 18 ORDER BY ALL""".stripMargin)
    ),
    // A5 argmax: top-1 by count with deterministic tie-break (SURVEY
    // §7.4: reference Kuzu top-1 is unordered on ties; we pin key asc).
    // orderBy+limit compiles to TakeOrderedAndProject: per-partition
    // top-1 + driver merge, no single-partition window shuffle.
    QueryDef(
      "a5_argmax",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("o_custkey").asc)
          .limit(1)
          .select("o_custkey", "n"),
      Some("""SELECT o_custkey, n FROM (
             |  SELECT o_custkey, count(*) AS n,
             |         row_number() OVER (ORDER BY count(*) DESC, o_custkey ASC) AS rn
             |  FROM orders GROUP BY o_custkey) t
             |WHERE rn = 1 ORDER BY ALL""".stripMargin)
    ),
    // A6 distinct values of a column (golden query 4 shape).
    QueryDef(
      "a6_distinct_values",
      (s, d) => orderedByAll(
        Tables.part(s, d).select(col("p_type")).distinct()),
      Some("SELECT DISTINCT p_type FROM part ORDER BY ALL")
    ),
    // A7 count under date-range predicate (golden queries 5/6 shape).
    QueryDef(
      "a7_range_count",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |WHERE year(o_orderdate) = 1995 GROUP BY o_orderstatus ORDER BY ALL""".stripMargin)
    ),
    // A8 count under substring predicate (golden queries 9/10 shape).
    QueryDef(
      "a8_substring_count",
      (s, d) => orderedByAll(
        Tables.part(s, d)
          .filter(lower(col("p_name")).contains("red"))
          .groupBy("p_brand").agg(count(lit(1)).as("n"))),
      Some("""SELECT p_brand, count(*) AS n FROM part
             |WHERE lower(p_name) LIKE '%red%' GROUP BY p_brand ORDER BY ALL""".stripMargin)
    ),
    // A9 accuracy-tally pivot: per-field boolean match counts + ratio
    // (reference baml_extract_eval.py:350-387).
    QueryDef(
      "a9_tally_pivot",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
            count(lit(1)).as("n"))
          .withColumn("f_ratio", col("n_f").cast(DoubleType) / col("n").cast(DoubleType))),
      Some("""SELECT o_orderpriority,
             |       CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |       CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |       CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
             |       count(*) AS n,
             |       CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS DOUBLE)
             |         / CAST(count(*) AS DOUBLE) AS f_ratio
             |FROM orders GROUP BY o_orderpriority ORDER BY ALL""".stripMargin)
    ),

    // ---- §2.6 windows / top-k ----------------------------------------
    // W1 partitioned rank: top-3 customers per nation by balance.
    QueryDef(
      "w1_window_rank",
      (s, d) => orderedByAll(
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_nationkey")
              .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
          .filter(col("rn") <= 3)
          .select("c_nationkey", "c_custkey", "c_acctbal", "rn")),
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |         row_number() OVER (PARTITION BY c_nationkey
             |                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer) t
             |WHERE rn <= 3 ORDER BY ALL""".stripMargin)
    ),
    // W2 running sum per key (frame-ordered, so the addition order is
    // identical in both engines; decimal keeps it exact anyway).
    QueryDef(
      "w2_running_sum",
      (s, d) => orderedByAll(
        Tables.events(s, d)
          .filter(col("user_id") < 10)
          .withColumn("cum",
            sum(col("value").cast(DecimalType(18, 2))).over(
              Window.partitionBy("user_id").orderBy("event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast(DoubleType))
          .select("user_id", "event_id", "cum")),
      Some("""SELECT user_id, event_id,
             |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             |              PARTITION BY user_id ORDER BY event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
             |FROM events WHERE user_id < 10 ORDER BY ALL""".stripMargin)
    ),
    // W6 ROLLING-window statistics — the bounded-frame sibling of
    // w2's running sum (rolling features for sessionized/time-series
    // data: trailing-4-event count/sum/min/max per user). Same
    // exactness discipline: the sum rides DECIMAL(18,2) inside the
    // frame (w2's trick — order-free), min/max/count are exact on
    // any type; frame = ROWS 3 PRECEDING..CURRENT, deterministic via
    // the unique event_id ordering.
    QueryDef(
      "w6_rolling_window",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-3, Window.currentRow)
        orderedByAll(
          Tables.events(s, d)
            .filter(col("user_id") < 10)
            .select(col("user_id"), col("event_id"),
              count(lit(1)).over(w).as("n_w"),
              sum(col("value").cast(DecimalType(18, 2))).over(w)
                .cast(DoubleType).as("sum_w"),
              min(col("value")).over(w).as("min_w"),
              max(col("value")).over(w).as("max_w")))
      },
      Some("""SELECT user_id, event_id,
             |  COUNT(*) OVER w AS n_w,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_w,
             |  MIN(value) OVER w AS min_w,
             |  MAX(value) OVER w AS max_w
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY ALL""".stripMargin)
    ),
    // Top-k: Catalyst compiles orderBy+limit to TakeOrderedAndProject
    // (no global sort). Total order inside the limit via tie-break key.
    QueryDef(
      "w3_topk",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin)
    ),
    // A11 rollup: subtotal lattice over (status, priority) — Spark's
    // rollup() IS the SQL GROUP BY ROLLUP; sums ride DECIMAL so the
    // totals are shuffle-order exact. Partial aggregation still
    // applies per grouping set (map-side combine before the one
    // shuffle).
    QueryDef(
      "a11_rollup",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY ALL""".stripMargin)
    ),
    // S7 set operators: INTERSECT/EXCEPT with SQL bag-to-set
    // semantics — customers with both an open and a finished order,
    // minus the AUTOMOBILE segment. Each set op is one shuffle on
    // the full row as key; dedup happens inside the op.
    QueryDef(
      "s7_set_ops",
      (s, d) => {
        val o = Tables.orders(s, d)
        val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        val auto = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey").as("o_custkey"))
        orderedByAll(open.intersect(fin).except(auto))
      },
      Some("""SELECT * FROM (
             |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |   INTERSECT
             |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |  EXCEPT
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
             |ORDER BY ALL""".stripMargin)
    ),
    // P11 unpivot (wide → long): lineitem measure columns melted to
    // (key, metric, v) rows — Spark's native unpivot, a zero-shuffle
    // per-row expansion; the oracle is the definitional UNION ALL.
    QueryDef(
      "p11_unpivot",
      (s, d) => orderedByAll(
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 100)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "v")),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS v
             |FROM lineitem WHERE l_orderkey < 100
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |FROM lineitem WHERE l_orderkey < 100
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY ALL""".stripMargin)
    ),
    // A13 exact quantiles per group: percentile() (exact linear
    // interpolation over the sorted group — Spark's sort-based
    // percentile, one shuffle) vs DuckDB quantile_cont, the same
    // definition. round(4) absorbs the last-bit float divergence of
    // the two engines' interpolation arithmetic.
    QueryDef(
      "a13_quantiles",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))),
      Some("""SELECT o_orderpriority,
             |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
             |FROM orders GROUP BY o_orderpriority ORDER BY ALL""".stripMargin)
    ),
    // W4 lead/lag: per-user event deltas — the offset window family
    // (lag value + gap to previous event in integer micros; one
    // shuffle on the partition key, sort within).
    QueryDef(
      "w4_lead_lag",
      (s, d) => orderedByAll(
        Tables.events(s, d)
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("prev_us",
            lag(col("ts_us"), 1).over(
              Window.partitionBy("user_id").orderBy("ts_us", "event_id")))
          .withColumn("gap_us", col("ts_us") - col("prev_us"))),
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |       lag(epoch_us(ts)) OVER w AS prev_us,
             |       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |ORDER BY ALL""".stripMargin)
    ),
    // W5 distribution windows — ntile + cume_dist (the quantile-
    // bucketing window family, completing rank/row_number/offset):
    // per-priority price quartiles and cumulative distribution.
    // cume_dist is rank/count — one IEEE division of exact ints —
    // and the (price, key) order is total, so ties cannot straddle
    // buckets differently across engines.
    QueryDef(
      "w5_ntile_cume",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        orderedByAll(
          Tables.orders(s, d)
            .filter(col("o_custkey") < 100)
            .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
            .withColumn("quartile", ntile(4).over(w))
            .withColumn("cd", cume_dist().over(w)))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
             |       ntile(4) OVER w AS quartile, cume_dist() OVER w AS cd
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY ALL""".stripMargin)
    ),
    // A12 one-pass table profile (training-data QA): row count, null
    // counts, exact distincts, and value bounds for the columns a
    // curation run gates on — a single aggregate, no per-column
    // rescans.
    QueryDef(
      "a12_profile",
      (s, d) => Tables.documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("lang_nulls"),
        countDistinct(col("lang")).as("lang_distinct"),
        countDistinct(col("source")).as("source_distinct"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")),
      Some("""SELECT count(*) AS n_rows,
             |       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
             |       count(DISTINCT lang) AS lang_distinct,
             |       count(DISTINCT source) AS source_distinct,
             |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents""".stripMargin)
    ),
    // A14 fixed-width histogram (profiling/QA): bin = floor(v / w) —
    // one IEEE division + floor, identical in both engines — with
    // count and exact value bounds per bin (min/max are order-free,
    // no summation of doubles anywhere). One keyed agg with map-side
    // combine; the bin key space is range/width regardless of row
    // count.
    QueryDef(
      "a14_histogram",
      (s, d) => orderedByAll(
        Tables.orders(s, d)
          .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))),
      Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
             |       count(*) AS n,
             |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM orders GROUP BY 1 ORDER BY ALL""".stripMargin)
    )
  )
}
