package graft

import graft.graph.{CypherLite, PropertyGraph}

/** Round-15 review findings, pinned: each test reproduced a defect in
  * the round's new surface before its fix (comprehension pipes vs rel
  * alternations, union-view mounts for comprehension sub-patterns,
  * apostrophe-placeholder restores in split delimiters, head-WITH
  * fold guards, datetime boundary days in duration.between, quoted
  * braces in CASE-EXISTS bodies).
  */
class ReviewRepro extends SparkSpec {
  import TestSession.spark.implicits._

  private lazy val gAlt = PropertyGraph(
    nodes = Map(
      "P" -> Seq((1L, "p1"), (2L, "p2")).toDF("id", "tag"),
      "X" -> Seq((10L, "x10")).toDF("id", "tag"),
      "Y" -> Seq((20L, "y20"), (21L, "y21")).toDF("id", "tag")),
    edges = Map(
      "RX" -> (("P", "X", Seq((1L, 10L)).toDF("src", "dst"))),
      "RY" -> (("P", "Y", Seq((1L, 20L), (2L, 21L)).toDF("src", "dst")))))

  test("pattern comprehension over a mixed alternation: the value bar " +
      "is found past the rel pipe, and the union view mounts") {
    val rows = CypherLite.query(gAlt,
      "MATCH (p:P) RETURN p.tag AS t, [(p)-[:RX|RY]->(x) | x.tag] AS xs " +
        "ORDER BY t")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq)).toSeq
    assert(rows === Seq(("p1", Seq("x10", "y20")), ("p2", Seq("y21"))))
  }

  test("head-WITH list constants substitute verbatim (no false fold)") {
    // 'p1-x' carries a '-' INSIDE the quoted member — not arithmetic
    val n = CypherLite.query(gAlt,
      "WITH ['p1-x', 'p2'] AS tags MATCH (p:P) WHERE p.tag IN tags " +
        "RETURN count(*) AS n").as[Long].head()
    assert(n === 1L)
  }

  test("head-WITH small-double folds render as plain decimals") {
    val n = CypherLite.query(gAlt,
      "WITH 1.0 / 10000000 AS k MATCH (p:P) WHERE p.id * k < 1 " +
        "RETURN count(*) AS n").as[Long].head()
    assert(n === 2L)
  }

  test("split on an apostrophe delimiter restores the placeholder") {
    val gq = PropertyGraph(
      nodes = Map("N" -> Seq((1L, "a'b'c"), (2L, "no")).toDF("id", "txt")),
      edges = Map.empty)
    val n = CypherLite.query(gq,
      "MATCH (n:N) WHERE any(w IN split(n.txt, \"'\") WHERE w = 'b') " +
        "RETURN count(*) AS n").collect()(0).getLong(0)
    assert(n === 1L)
    val xs = CypherLite.query(gq,
      "MATCH (n:N) WHERE n.id = 1 RETURN [w IN split(n.txt, \"'\") " +
        "| toUpper(w)] AS ws").collect()(0).getSeq[String](0).toSeq
    assert(xs === Seq("A", "B", "C"))
  }

  test("quoted braces inside a CASE-EXISTS body stay text") {
    val rows = CypherLite.query(gAlt,
      "MATCH (p:P) RETURN CASE WHEN EXISTS { MATCH (p)-[:RX]->(x) " +
        "WHERE x.tag = '}' } THEN 'y' ELSE 'n' END AS f, count(*) AS n " +
        "ORDER BY f")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("n", 2L)))
  }

  test("duration.between on datetimes: the boundary day needs the " +
      "time-of-day to reach the start's (java Period parity)") {
    val gt = PropertyGraph(
      nodes = Map("E" -> Seq(
        (1L, "2020-01-15 10:00:00", "2020-02-15 09:00:00"),
        (2L, "2020-01-15 10:00:00", "2020-02-15 10:00:00"))
        .toDF("id", "t0", "t1")
        .selectExpr("id", "to_timestamp(t0) AS t0", "to_timestamp(t1) AS t1")),
      edges = Map.empty)
    val rows = CypherLite.query(gt,
      "MATCH (e:E) RETURN e.id AS i, " +
        "duration.between(e.t0, e.t1).months AS m ORDER BY i")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 0L), (2L, 1L)))
  }
}
