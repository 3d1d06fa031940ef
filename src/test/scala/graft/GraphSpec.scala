package graft

import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.graph.PropertyGraph.{In, Out}

/** Direction-aware traversal (reference rag.baml:279 reversed
  * arrowheads, README.md:137 undirected var-length).
  */
class GraphSpec extends SparkSpec {
  import TestSession.spark.implicits._

  //   a1 ─REL1→ b2 ←REL2─ c3        a4 ─REL1→ b5
  private lazy val g = PropertyGraph(
    nodes = Map(
      "A" -> Seq((1L, "a1"), (4L, "a4")).toDF("id", "tag"),
      "B" -> Seq((2L, "b2"), (5L, "b5")).toDF("id", "tag"),
      "C" -> Seq((3L, "c3")).toDF("id", "tag")),
    edges = Map(
      "REL1" -> (("A", "B", Seq((1L, 2L), (4L, 5L)).toDF("src", "dst"))),
      "REL2" -> (("C", "B", Seq((3L, 2L)).toDF("src", "dst")))))

  test("in() arrives at edge sources; out() at destinations") {
    val ids = Seq(2L).toDF("id")
    assert(g.in("REL1", ids).as[Long].collect().toSet === Set(1L))
    assert(g.in("REL2", ids).as[Long].collect().toSet === Set(3L))
    assert(g.out("REL1", Seq(4L).toDF("id")).as[Long].collect().toSet === Set(5L))
  }

  test("matchPattern composes Out and In steps — (a)-[:R1]->(b)<-[:R2]-(c)") {
    val res = g.matchPattern("A", col("id") === 1L,
      Seq("REL1" -> Out, "REL2" -> In))
    assert(res.select("id").as[Long].collect().toSet === Set(3L))
    assert(res.columns.toSet === Set("id", "tag"), "terminal label must be C's node table")
    // a4's branch ends at b5, which no REL2 edge reaches — empty
    val none = g.matchPattern("A", col("id") === 4L,
      Seq("REL1" -> Out, "REL2" -> In))
    assert(none.count() === 0)
  }

  test("undirected bfs walks against edge direction; directed does not") {
    val edges = Seq(("n1", "n2"), ("n2", "n3")).toDF("src", "dst")
    val start = Seq("n3").toDF("id")
    val directed = g.bfs(edges, start, 2).as[(String, Int)].collect().toMap
    assert(directed === Map("n3" -> 0), "n3 has no outgoing edges")
    val undirected = g.bfs(edges, start, 2, undirected = true)
      .as[(String, Int)].collect().toMap
    assert(undirected === Map("n3" -> 0, "n2" -> 1, "n1" -> 2))
  }

  test("undirected bfs keeps minimal depth when forward and back paths meet") {
    val edges = Seq(("x", "y"), ("z", "y")).toDF("src", "dst")
    val start = Seq("x").toDF("id")
    val got = g.bfs(edges, start, 3, undirected = true)
      .as[(String, Int)].collect().toMap
    assert(got === Map("x" -> 0, "y" -> 1, "z" -> 2))
  }

  test("deep bfs with checkpoint cadence 3 matches per-level checkpointing") {
    // a 7-node chain forces levels past two checkpoint boundaries
    val edges = (1 to 6).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val start = Seq("n1").toDF("id")
    val got = g.bfs(edges, start, 6).as[(String, Int)].collect().toMap
    assert(got === (1 to 7).map(i => s"n$i" -> (i - 1)).toMap)
    val perLevel = g.bfs(edges, start, 6, checkpointEvery = 1)
      .as[(String, Int)].collect().toMap
    assert(perLevel === got)
  }

  import PropertyGraph.{PatternNode, PatternStep}

  test("matchPattern stays a set under fan-in (one dedup at pattern end)") {
    val h = PropertyGraph(
      nodes = Map(
        "A" -> Seq((1L, "a1"), (4L, "a4")).toDF("id", "tag"),
        "B" -> Seq((2L, "b2")).toDF("id", "tag")),
      edges = Map("REL1" -> (("A", "B",
        Seq((1L, 2L), (4L, 2L)).toDF("src", "dst")))))
    assert(h.matchPattern("A", lit(true), Seq("REL1" -> Out)).count() === 1)
  }

  test("matchPaths keeps one row per path — multiplicity ≠ reachability") {
    val h = PropertyGraph(
      nodes = Map(
        "A" -> Seq((1L, "a1"), (4L, "a4")).toDF("id", "tag"),
        "B" -> Seq((2L, "b2")).toDF("id", "tag")),
      edges = Map("REL1" -> (("A", "B",
        Seq((1L, 2L), (4L, 2L)).toDF("src", "dst")))))
    val paths = h.matchPaths(PatternNode("B", "b"),
      Seq(PatternStep("REL1", In, PatternNode("A", "a"))))
    assert(paths.columns.toSeq === Seq("b", "a"))
    assert(paths.count() === 2, "two paths land in b2")
    assert(paths.select("b").distinct().count() === 1, "but one distinct endpoint")
  }

  test("matchPaths: mid-chain predicate and a branch off a named position") {
    // (a:A)-[:REL1]->(b:B {id=2})<-[:REL2]-(c:C), branch (a2:A)-[:REL1]->(b)
    // — the two REL1 steps share an edge table, so whole-pattern
    // relationship isomorphism applies: a2 may not rebind the step-1
    // edge. With only (1,2) into b2 the branch has no distinct edge
    // left (empty); adding (4,2) gives it one, binding a2 = 4.
    val p = g.matchPaths(
      PatternNode("A", "a"),
      Seq(
        PatternStep("REL1", Out, PatternNode("B", "b", Some(col("id") === 2L))),
        PatternStep("REL2", In, PatternNode("C", "c")),
        PatternStep("REL1", In, PatternNode("A", "a2"), from = Some("b"))))
    assert(p.columns.toSeq === Seq("a", "b", "c", "a2"))
    assert(p.count() === 0, "a2 = 1 would reuse the step-1 edge (1,2)")
    val g2 = g.copy(edges = g.edges + ("REL1" -> (("A", "B",
      Seq((1L, 2L), (4L, 5L), (4L, 2L)).toDF("src", "dst")))))
    val p2 = g2.matchPaths(
      PatternNode("A", "a", Some(col("id") === 1L)),
      Seq(
        PatternStep("REL1", Out, PatternNode("B", "b", Some(col("id") === 2L))),
        PatternStep("REL2", In, PatternNode("C", "c")),
        PatternStep("REL1", In, PatternNode("A", "a2"), from = Some("b"))))
    assert(p2.as[(Long, Long, Long, Long)].collect().toSeq === Seq((1L, 2L, 3L, 4L)))
  }

  test("attach pulls node properties for selected positions") {
    val paths = g.matchPaths(PatternNode("A", "a", Some(col("id") === 1L)),
      Seq(PatternStep("REL1", Out, PatternNode("B", "b"))))
    val withProps = g.attach(g.attach(paths, "a", "A", Seq("tag"), "a_"),
      "b", "B", Seq("tag"), "b_")
    assert(withProps.select("a_tag", "b_tag").as[(String, String)].collect().toSeq ===
      Seq(("a1", "b2")))
  }

  test("matchPaths rejects duplicate aliases and unknown anchors") {
    intercept[IllegalArgumentException] {
      g.matchPaths(PatternNode("A", "x"),
        Seq(PatternStep("REL1", Out, PatternNode("B", "x"))))
    }
    intercept[IllegalArgumentException] {
      g.matchPaths(PatternNode("A", "a"),
        Seq(PatternStep("REL1", Out, PatternNode("B", "b"), from = Some("nope"))))
    }
  }

  test("triangleCounts: per-node tallies; duplicates/reversals/self-loops tolerated") {
    // two triangles sharing edge (2,3): {1,2,3} and {2,3,4}; node 6
    // hangs off a non-triangle edge, node 5 only self-loops
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L),
      (3L, 2L), // reversed duplicate of (2,3)
      (5L, 5L), // self-loop — dropped
      (4L, 6L)  // dangling edge — no triangle
    ).toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      "each node counts the triangles it participates in; 5 and 6 absent")
  }

  test("triangleCounts on a complete K4 finds all four triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val k4 = (for { a <- nodes; b <- nodes if a < b } yield (a, b))
      .toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.triangleCounts(k4)
      .as[(Long, Long)].collect().toMap
    // C(4,3) = 4 triangles; each node sits in C(3,2) = 3 of them
    assert(got === nodes.map(_ -> 3L).toMap)
  }

  test("personalizedPageRank anchors mass at the seed set") {
    // chain 1→2→3, seed {1}, d = 0.85, 3 rounds:
    //   r1: {1: 0.15, 2: 0.85}
    //   r2: {1: 0.15, 2: 0.1275, 3: 0.7225}
    //   r3: {1: 0.15, 2: 0.1275, 3: 0.108375}   (3 has no out-edges;
    //       its inbound mass leaks, same documented variant as pageRank)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seed = Seq(Tuple1(1L)).toDF("id")
    val got = graft.graph.GraphAnalytics
      .personalizedPageRank(edges, seed, iters = 3)
      .as[(Long, Double)].collect().toMap
    val want = Map(1L -> (1.0 - 0.85), 2L -> 0.85 * (1.0 - 0.85),
      3L -> 0.85 * 0.85 * (1.0 - 0.85))
    assert(got.keySet === want.keySet, "walk-unreached nodes are absent")
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-12, s"node $k: ${got(k)} vs $w")
    assert(got(1L) > got(2L) && got(2L) > got(3L),
      "relevance decays with distance from the seed")
  }

  test("linkPredictScores: non-adjacent pairs only, hand-computed Jaccard") {
    // square 1-2-3-4-1 with pendant 5 off node 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))
      .toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.linkPredictScores(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      (1L, 3L) -> ((2L, 1.0)),       // share {2,4}; deg 2+2, |∪| = 2
      (2L, 4L) -> ((2L, 2.0 / 3.0)), // share {1,3}; deg 2+3, |∪| = 3
      (1L, 5L) -> ((1L, 0.5)),       // share {4}; deg 2+1, |∪| = 2
      (3L, 5L) -> ((1L, 0.5))),
      "adjacent pairs and no-common-neighbor pairs (2,5) must be absent")
  }

  test("linkPredictScores maxDegree: planted hub's quadratic wedges drop; " +
      "survivors keep true-degree Jaccard") {
    // hub 100 with spokes 1..6 (deg 6); side wedge 1–7–2 (deg(7)=2)
    val edges = ((1L to 6L).map(i => (100L, i)) ++ Seq((1L, 7L), (2L, 7L)))
      .toDF("src", "dst")
    // uncapped: all C(6,2)=15 spoke pairs share the hub, plus (7,100)
    // via mids 1 and 2 → 16 candidate pairs
    val full = graft.graph.GraphAnalytics.linkPredictScores(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(full.size === 16, s"uncapped pair count: ${full.size}")
    assert(full((1L, 2L)) === ((2L, 1.0)), "share {hub, 7}; deg 2+2, union 2")
    // capped below the hub degree: hub never serves as a mid — the 14
    // hub-only spoke pairs vanish, wedge volume stays bounded
    val capped = graft.graph.GraphAnalytics.linkPredictScores(edges, 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(capped === Map(
      // ncommon counts only the non-hub mid 7; Jaccard keeps TRUE
      // endpoint degrees (2 and 2) → conservative 1/(2+2-1)
      (1L, 2L) -> ((1L, 1.0 / 3.0)),
      // (7,100) rides mids 1 and 2 (both deg 2 ≤ cap); deg(100)=6 stays true
      (7L, 100L) -> ((2L, 2.0 / (2.0 + 6.0 - 2.0)))),
      "only pairs reachable through non-hub mids survive the cap")
  }

  test("connectedComponents: weak connectivity, min-id reps, direction ignored") {
    // component A: 1→2→3 plus a back-edge 3→1; component B: 10←11
    // (direction must not matter); self-loop on 20 is its own comp
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (11L, 10L), (20L, 20L))
      .toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("prepared edge-set cache: LRU eviction unpersists; clear hook unpersists") {
    import graft.ops.GraphOps
    val none = org.apache.spark.storage.StorageLevel.NONE
    val oldCap = GraphOps.maxPrepared
    try {
      GraphOps.clearPreparedCache()
      GraphOps.maxPrepared = 1
      // populate key (session, sf0.001) through a public consumer
      graft.SparkEntry.queries("g1_varlength_bfs")(spark, TestSession.sf0001).count()
      val p1 = GraphOps.preparedFor(spark, TestSession.sf0001)
      assert(p1.isDefined && p1.get.e.storageLevel != none, "entry cached+persisted")
      // a second key overflows the cap-1 LRU: the first entry must be
      // dropped AND its frames unpersisted (not leaked)
      graft.SparkEntry.queries("g1_varlength_bfs")(spark, TestSession.sf001).count()
      assert(GraphOps.preparedFor(spark, TestSession.sf0001).isEmpty, "LRU evicted")
      assert(p1.get.e.storageLevel == none &&
        p1.get.withDeg.storageLevel == none, "eviction unpersisted the frames")
      val p2 = GraphOps.preparedFor(spark, TestSession.sf001)
      assert(p2.isDefined && p2.get.e.storageLevel != none)
      // the explicit session-close hook unpersists what remains
      GraphOps.clearPreparedCache(Some(spark))
      assert(GraphOps.preparedFor(spark, TestSession.sf001).isEmpty)
      assert(p2.get.e.storageLevel == none)
    } finally {
      GraphOps.maxPrepared = oldCap
      GraphOps.clearPreparedCache()
    }
  }

  test("shortestPaths relaxes a cheaper longer-hop path over a direct edge") {
    val edges = Seq(("s", "t", 10.0), ("s", "m", 1.0), ("m", "t", 2.0))
      .toDF("src", "dst", "w")
    val got = graft.graph.GraphAnalytics
      .shortestPaths(edges, Seq("s").toDF("id"), maxHops = 3)
      .as[(String, Double)].collect().toMap
    assert(got === Map("s" -> 0.0, "m" -> 1.0, "t" -> 3.0))
  }

  test("shortestPaths hop bound caps relaxation depth") {
    val edges = Seq(("s", "t", 10.0), ("s", "m", 1.0), ("m", "t", 2.0))
      .toDF("src", "dst", "w")
    val got = graft.graph.GraphAnalytics
      .shortestPaths(edges, Seq("s").toDF("id"), maxHops = 1)
      .as[(String, Double)].collect().toMap
    assert(got === Map("s" -> 0.0, "m" -> 1.0, "t" -> 10.0),
      "the 2-hop improvement must not apply at maxHops = 1")
  }

  test("shortestPaths: negative weights relax within the hop budget; " +
      "a negative cycle cannot diverge (bounded rounds)") {
    // s→a (1), a→b (1), b→a (−5): the a↔b loop is a negative cycle —
    // each lap improves both labels, so only the hop bound ends the
    // walk. ≤4-edge paths: a ∈ {1, −3}, b ∈ {2, −2}.
    val edges = Seq(("s", "a", 1.0), ("a", "b", 1.0), ("b", "a", -5.0))
      .toDF("src", "dst", "w")
    val got = graft.graph.GraphAnalytics
      .shortestPaths(edges, Seq("s").toDF("id"), maxHops = 4)
      .as[(String, Double)].collect().toMap
    assert(got === Map("s" -> 0.0, "a" -> -3.0, "b" -> -2.0))
  }

  test("shortestPaths early-exits on an exhausted frontier and takes " +
      "the min across multiple sources") {
    // two sources converging on n: the cheaper source wins; maxHops 9
    // over a depth-1 graph exercises the checkpoint-boundary probe
    // (rounds 2..9 must be free, not nine empty joins — correctness
    // here, the cost claim is the bfs cadence discipline)
    val edges = Seq(("s1", "n", 5.0), ("s2", "n", 2.0)).toDF("src", "dst", "w")
    val got = graft.graph.GraphAnalytics
      .shortestPaths(edges, Seq("s1", "s2").toDF("id"), maxHops = 9,
        checkpointEvery = 2)
      .as[(String, Double)].collect().toMap
    assert(got === Map("s1" -> 0.0, "s2" -> 0.0, "n" -> 2.0))
  }

  test("shortestPaths rejects a non-positive hop budget") {
    val edges = Seq(("s", "t", 1.0)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      graft.graph.GraphAnalytics.shortestPaths(edges, Seq("s").toDF("id"), 0)
    }
  }
}
