package graft

import org.apache.spark.sql.functions._

/** Every declared QueryDef must run at sf0.001; spot values pinned. */
class RelationalSpec extends SparkSpec {

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} runs and produces a well-formed result") {
      val df = q.run(spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        "duplicate output column names break the oracle compare")
    }
  }

  test("every oracle query's spark side aliases all computed columns") {
    // un-aliased aggregates surface as names like "sum(x)" / "count(1)";
    // the driver sorts columns by name so these never match DuckDB.
    for (q <- SparkEntry.allDefs if q.oracle.isDefined) {
      val cols = q.run(spark, sf).columns
      val bad = cols.filter(c => c.contains("(") || c.contains(" "))
      assert(bad.isEmpty, s"${q.name}: suspicious column names ${bad.mkString(",")}")
    }
  }

  test("every query in the inventory carries a DuckDB oracle") {
    // spec-only operators live in library modules, not SparkEntry —
    // anything registered as a query must be driver-checkable
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      "queries without oracles downgrade the correctness gate to rows-only")
  }

  test("a1_group_agg matches hand-computed sf0.001 aggregate") {
    val row = SparkEntry.queries("a1_group_agg")(spark, sf)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect()
    assert(row.length === 1)
    val want = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .count()
    assert(row(0).getAs[Long]("n_rows") === want)
  }

  test("j6 anti + j7 semi partition customers against the filter") {
    // semi(predicate) and anti(predicate) are complements over customer.
    val total = graft.core.Tables.customer(spark, sf).count()
    val anti = SparkEntry.queries("j6_anti_join")(spark, sf).count()
    val semiPred = graft.core.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000)
      .select("o_custkey").distinct().count()
    assert(anti === total - semiPred)
  }

  test("w3_topk returns exactly k rows in descending price order") {
    val rows = SparkEntry.queries("w3_topk")(spark, sf).collect()
    assert(rows.length === 25)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }
}

/** Physical-plan properties that encode the 100TB design contract. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("j1/j3 dimension joins broadcast (no shuffle of the fact side)") {
    assert(plan("j1_join_inner").contains("BroadcastHashJoin"))
    val p3 = plan("j3_multihop")
    assert(p3.contains("BroadcastHashJoin"))
    assert(!p3.contains("SortMergeJoin"))
  }

  test("s1 filter is pushed down to the parquet scan") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,500)]")
      || p.contains("LessThan(l_orderkey,500)"), p.linesIterator.filter(_.contains("Pushed")).mkString)
  }

  test("a5_argmax and w3_topk use TakeOrderedAndProject, not global sort") {
    assert(plan("a5_argmax").contains("TakeOrderedAndProject"))
    assert(plan("w3_topk").contains("TakeOrderedAndProject"))
  }

  test("g32 edge predicate pushes to the edge table's parquet scan") {
    // WHERE r.o_totalprice > 400000 compiles to an edge predicate on
    // the HAS_ORDER relation — it must reach the orders.parquet scan
    // as a pushed filter (the 100-TB posture: the scan reads only
    // passing row groups), and the scan must be pruned to the
    // referenced columns
    val p = plan("g32_cypher_rel_pred")
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    assert(p.contains("GreaterThan(c_acctbal,0.0)"),
      "node predicate must push to the customer scan")
    assert(!p.contains("o_orderdate"), "unreferenced columns must prune")
  }

  test("g68 arith node predicate evaluates at the scan and infers across the join") {
    // `c.c_custkey % 2 = 0` must run as a DataFilter on the customer
    // scan (parquet cannot push `%` as a row-group filter, but the
    // filter sits directly on a 1-column scan before the join) — and
    // Catalyst infers the same predicate onto the orders side through
    // the equi-join key, halving BOTH scans' output at 100 TB
    val p = plan("g68_cypher_arith_where")
    assert(p.contains("(c_custkey") && p.contains("% 2) = 0)"),
      "modulo predicate must filter the customer scan")
    assert(p.contains("(o_custkey") && p.linesIterator
        .exists(l => l.contains("o_custkey") && l.contains("% 2) = 0)")),
      "the join must infer the predicate onto the orders scan")
  }

  test("g65 head UNWIND is a Generate (explode), never a cartesian or sort-merge") {
    val p = plan("g65_cypher_head_unwind")
    assert(p.contains("Generate explode"),
      "the literal list must explode in place")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the value equality must ride a broadcast equi-join")
  }

  test("g35 EXISTS pattern predicate compiles to LeftSemi; its rel predicate pushes") {
    // the EXISTS subquery must be a semi-join (a FILTER on the path
    // frame — never an inner join that would fan out per qualifying
    // order), and the subquery's relationship predicate must reach
    // the orders.parquet scan as a pushed filter with pruned columns
    val p = plan("g35_cypher_exists")
    assert(p.contains("LeftSemi"), "EXISTS must compile to a semi-join")
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    assert(!p.contains("o_orderdate"), "unreferenced columns must prune")
    val p34 = plan("g34_cypher_not_exists")
    assert(p34.contains("LeftAnti"), "NOT pattern must compile to an anti-join")
  }

  test("g107 label absorption relabels the scan — no any-node union, filter pushed") {
    // `MATCH (c) WHERE c:customer AND c.c_acctbal > 9900` must scan
    // ONLY customer.parquet (the absorb rewrite types the scan at
    // parse), with the numeric predicate pushed into it — the label
    // predicate itself costs nothing at runtime
    val p = plan("g107_cypher_label_predicate")
    assert(p.contains("GreaterThan(c_acctbal,9900.0)"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    assert(!p.contains("orders.parquet") && !p.contains("nation.parquet"),
      "the label-predicate scan must touch only the customer table")
    assert(!p.contains("Union"), "no any-node union view may survive")
  }

  test("g112 step expansion scans only the matching edge table; no all-edges union") {
    // the untyped `-[r]->` from :nation expands to HAS_CUSTOMER at
    // query build — the plan must not union every edge table, and the
    // pattern predicate stays a semi-join
    val p = plan("g112_cypher_step_inference")
    assert(p.contains("LeftSemi"),
      "the (x)-[:HAS_ORDER]->() predicate must compile to a semi-join")
    assert(!p.contains("region.parquet"),
      "expansion must not scan edge tables that cannot match")
  }

  test("g113 OPTIONAL MATCH + IS NULL compiles to a left join then null filter, broadcast") {
    val p = plan("g113_cypher_optional_null")
    assert(p.contains("BroadcastHashJoin") || p.contains("LeftOuter"),
      "the optional step must be an outer/broadcast join, not sort-merge")
    assert(!p.contains("CartesianProduct"))
  }

  test("g42 UNION ALL concatenates shuffle-free — no dedup aggregate") {
    // UNION ALL is a plan-level Union of the parts: the only exchange
    // allowed is the final deterministic-output sort. A HashAggregate
    // here would mean the engine paid bare-UNION's distinct for the
    // ALL form — corpus-sized waste at 100 TB.
    val p = plan("g42_cypher_union")
    assert(p.contains("Union"), "parts must combine via a plan Union")
    assert(!p.contains("HashAggregate"), s"UNION ALL must not dedup:\n$p")
  }

  test("s1 scan prunes columns to the projected set") {
    val p = plan("s1_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"))
  }

  test("g3 inbound pattern compiles to broadcast joins, never sort-merge") {
    val p = plan("g3_inbound")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("e5/e6 are single codegen'd projections over pruned scans") {
    for (q <- Seq("e5_email_policy", "e6_judge_contains")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle: only the final sort exchange is allowed")
      assert(!p.contains("BatchEvalPython") && !p.contains("SQL UDF"), q)
    }
    val read = plan("e6_judge_contains").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"e6 must read only doc_id: $read")
  }

  test("g5/g6 pattern-DSL queries compile to broadcast joins, never sort-merge") {
    for (q <- Seq("g5_path_count", "g6_midchain_filter")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), q)
      assert(!p.contains("SortMergeJoin"), q)
    }
  }

  test("g2 matchPattern pays exactly ONE dedup exchange (terminal distinct)") {
    // round 4 paid one exchange per hop; the pattern compiles to a
    // join chain with a single aggregate-dedup before the node join
    val p = plan("g2_pattern_match")
    val dedups = "HashAggregate\\(keys=\\[id".r.findAllIn(p).length
    assert(dedups <= 2, s"per-hop distincts crept back in:\n$p")
  }

  test("v4 batch-KNN: queries broadcast; no corpus-sized single-reducer window") {
    val p = plan("v4_knn_batch")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query set must broadcast")
    // phase-1 window partitions by (qid, salt) — the salted spread
    assert(p.contains("__salt"), "salted two-phase rank missing")
  }

  test("t5 packing windows partition by shard — never a global single partition") {
    val p = plan("t5_seq_pack")
    assert(p.contains("hashpartitioning(shard"), "running sum must shuffle on shard")
    assert(!p.contains("SinglePartition"),
      "per-shard packing must not fall into the s4 single-partition window trap")
  }

  test("e1 email detection is builtin regexp, not a second UDF column") {
    val p = plan("e1_email_mask")
    val udfCount = "ScalaUDF".r.findAllIn(p).length
    assert(p.contains("regexp_extract_all"), "detection must use the builtin")
    // the mask legitimately remains the engine's one guardrail UDF
    assert(udfCount <= 2, s"extra UDF columns crept in:\n$p")
  }

  test("e7 PII scrub is one codegen'd projection: no UDF, no exchange but the sort") {
    val p = plan("e7_pii_scrub")
    assert(!p.contains("ScalaUDF"), "detect AND mask must be regexp builtins")
    assert(!p.contains("Exchange hashpartitioning"),
      s"e7 must not shuffle before the presentation sort:\n$p")
  }

  test("t8 vocab membership rides a broadcast join; vocab ranks via TakeOrdered") {
    val p = plan("t8_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "50-row vocab must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "vocab top-50 must not global-sort")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must never shuffle on token:\n$p")
  }

  test("x6 SCD2 pays ONE distribution: all window passes share the key exchange") {
    val p = plan("x6_scd2")
    val exchanges = "Exchange hashpartitioning\\(__k".r.findAllIn(p).length
    assert(exchanges === 1,
      s"scd2's row_number/lag, running sum, and lead must reuse one exchange:\n$p")
  }

  test("x7 quantile gate broadcasts the threshold table back onto the corpus") {
    val p = plan("x7_quantile_gate")
    assert(p.contains("BroadcastHashJoin"), "per-source thresholds must broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for the gate join:\n$p")
  }

  test("round-9 additions: no cartesian products, no nested-loop joins") {
    // r10's one BroadcastNestedLoopJoin is the deliberate 1-row
    // corpus-stats broadcast cross-join (the r2/r3 pattern) — exempt
    for (q <- Seq("r10_keywords", "r11_snippet_window", "x12_token_budget",
        "e8_secrets_scrub", "w6_rolling_window", "g23_components",
        "t11_bpe_tokenize", "g19_cypher_tolower", "g20_cypher_datetime",
        "g21_cypher_with", "g22_cypher_with_chain")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      if (q != "r10_keywords")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ:\n$p")
    }
  }

  test("r11 snippet candidates ride the doc_id equi-join, range as residual") {
    // the per-doc range self-join must key on doc_id (hash/sort join)
    // with the position range as a post-join condition — a pure range
    // join here would be all-pairs per partition
    val p = plan("r11_snippet_window")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"r11 needs an equi-join on doc_id:\n$p")
  }

  test("e8 secrets scrub is one codegen'd projection, like e7") {
    val p = plan("e8_secrets_scrub")
    assert(!p.contains("ScalaUDF"), "detect AND scrub must be regexp builtins")
    assert(!p.contains("Exchange hashpartitioning"),
      s"e8 must not shuffle before the presentation sort:\n$p")
  }

  test("w6 rolling window pays one key exchange; every window is partitioned") {
    val p = plan("w6_rolling_window")
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges === 1, s"w6's frame aggregates must share one exchange:\n$p")
    assert(!p.contains("Window [") ||
      !p.linesIterator.exists(l => l.contains("Window [") && l.contains("], []")),
      s"unpartitioned window (single-reducer) in w6:\n$p")
  }

  test("x12 token budget: rank windows are partitioned — never a global sort") {
    val p = plan("x12_token_budget")
    assert(!p.linesIterator.exists(l => l.contains("Window [") && l.contains("], []")),
      s"unpartitioned window (whole-corpus single reducer) in x12:\n$p")
  }
}
