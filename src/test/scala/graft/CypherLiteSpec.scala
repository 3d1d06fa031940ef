package graft

import graft.graph.{CypherLite, PropertyGraph}
import graft.graph.PropertyGraph.{In, Out}

/** The textual Text2Cypher entry: reference-shaped MATCH patterns
  * (rag.baml:65-102 contract; reversed arrowheads per rag.baml:279)
  * parse and execute over the join-based path DSL.
  */
class CypherLiteSpec extends SparkSpec {
  import TestSession.spark.implicits._

  //   a1 ─R1→ b2 ←R2─ c3     a4 ─R1→ b5 ; b2 also ←R1─ a4 (fan-in)
  private lazy val g = PropertyGraph(
    nodes = Map(
      "A" -> Seq((1L, "a1"), (4L, "a4")).toDF("id", "tag"),
      "B" -> Seq((2L, "b2"), (5L, "b5")).toDF("id", "tag"),
      "C" -> Seq((3L, "c3")).toDF("id", "tag")),
    edges = Map(
      "R1" -> (("A", "B", Seq((1L, 2L), (4L, 5L), (4L, 2L)).toDF("src", "dst"))),
      "R2" -> (("C", "B", Seq((3L, 2L)).toDF("src", "dst")))))

  test("mixed-arrowhead chain with inline props parses and runs") {
    val rows = CypherLite.query(g,
      "MATCH (a:A {id: 1})-[:R1]->(b:B)<-[:R2]-(c:C)")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 2L, 3L)))
  }

  test("RETURN attaches node properties as alias_prop columns") {
    val df = CypherLite.query(g,
      "MATCH (a:A {id: 1})-[:R1]->(b:B) RETURN a.tag, b.tag")
    assert(df.columns.toSeq === Seq("a_tag", "b_tag"))
    assert(df.as[(String, String)].collect().toSeq === Seq(("a1", "b2")))
  }

  test("one row per path: fan-in multiplicity survives the text route") {
    val n = CypherLite.query(g, "(a:A)-[:R1]->(b:B {id: 2})").count()
    assert(n === 2, "a1->b2 and a4->b2 are distinct paths")
  }

  test("anonymous nodes get positional aliases; MATCH keyword optional") {
    val df = CypherLite.query(g, "(:A {id: 4})-[:R1]->(:B)")
    assert(df.columns.length === 2)
    assert(df.count() === 2, "a4 reaches b5 and b2")
  }

  test("string, boolean, and decimal literals parse; strings filter correctly") {
    val rows = CypherLite.query(g,
      "(a:A {tag: 'a4'})-[:R1]->(b:B) RETURN b.tag")
      .as[String].collect().toSet
    assert(rows === Set("b5", "b2"))
  }

  test("parse exposes directions — the reversed-arrowhead contract") {
    val p = CypherLite.parse("(s:S)-[:X]->(a:A)<-[:Y]-(p:P)")
    assert(p.steps.map(_.dir) === Seq(Out, In))
    assert(p.steps.map(_.rel) === Seq("X", "Y"))
    assert(p.labels === Map("s" -> "S", "a" -> "A", "p" -> "P"))
  }

  test("comma-separated pattern parts branch off bound aliases (q8 shape)") {
    // (a)-R1->(b)<-R2-(c) plus a branch re-entering at b:
    // which OTHER A-nodes also point at b2?
    val df = CypherLite.query(g,
      """MATCH (a:A {id: 1})-[:R1]->(b:B)<-[:R2]-(c:C),
        |      (b)<-[:R1]-(a2:A)
        |RETURN c.tag, a2.tag""".stripMargin)
    assert(df.columns.toSeq === Seq("c_tag", "a2_tag"))
    assert(df.as[(String, String)].collect().toSet ===
      Set(("c3", "a1"), ("c3", "a4")), "both R1 edges into b2 are paths")
  }

  test("whitespace inside quoted literals survives parsing") {
    val h = PropertyGraph(
      nodes = Map(
        "A" -> Seq((1L, "two  spaces")).toDF("id", "tag"),
        "B" -> Seq((2L, "b")).toDF("id", "tag")),
      edges = Map("R1" -> (("A", "B", Seq((1L, 2L)).toDF("src", "dst")))))
    val n = CypherLite.query(h, "(a:A {tag: 'two  spaces'})-[:R1]->(b:B)").count()
    assert(n === 1, "the double space in the literal must not be squeezed")
  }

  test("a continuation part must start at a bound alias") {
    intercept[IllegalArgumentException] {
      CypherLite.parse("(a:A)-[:R1]->(b:B), (z:C)-[:R2]->(w:B)")
    }
  }

  test("malformed statements fail loudly, not silently") {
    intercept[IllegalArgumentException] { CypherLite.parse("(a)-[:R1]->(b:B)") } // no label
    intercept[IllegalArgumentException] { CypherLite.parse("(a:A) (b:B)") }      // no edge
    intercept[IllegalArgumentException] { CypherLite.parse("(a:A)") }            // no step
    intercept[IllegalArgumentException] {
      CypherLite.parse("(a:A)-[:R1]->(b:B) RETURN z.tag")                        // unknown alias
    }
    intercept[IllegalArgumentException] {
      CypherLite.parse("(a:A {id: id})-[:R1]->(b:B)")                            // bad literal
    }
  }
}
