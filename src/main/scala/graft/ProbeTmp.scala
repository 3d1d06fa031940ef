package graft

import graft.graph.CypherLite
import graft.fhir.FhirPipeline

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("8")
    val g = FhirPipeline.buildGraph(
      FhirPipeline.load(spark, "/root/reference/data/extracted_fhir.json"))
    def show(s: String): Unit = {
      println(s"=== $s")
      try CypherLite.query(g, s).show(10, truncate = false)
      catch { case e: Throwable => println(s"REJECT: ${e.getMessage}") }
    }
    // judge's miss #3 shapes
    show("""MATCH (a:Allergy)
      |WITH collect(DISTINCT a.category) AS cats
      |RETURN 'food' IN cats AS hasFood, size(cats) AS n""".stripMargin)
    show("""MATCH (a:Allergy)
      |WITH collect(DISTINCT a.category) AS cats
      |WHERE 'food' IN cats
      |RETURN size(cats) AS n""".stripMargin)
    show("""MATCH (a:Allergy)
      |WITH collect(DISTINCT a.category) AS cats
      |WHERE 'nope' IN cats
      |RETURN size(cats) AS n""".stripMargin)
    // NOT + name LHS + per-group lists
    show("""MATCH (p:Patient)-[:EXPERIENCES]->(a:Allergy)
      |WITH p.surname AS s, collect(a.category) AS cats
      |WHERE NOT 'food' IN cats
      |RETURN count(*) AS n""".stripMargin)
    show("""MATCH (p:Patient)-[:EXPERIENCES]->(a:Allergy)
      |WITH p.gender AS g2, collect(DISTINCT a.category) AS cats
      |RETURN g2, 'food' IN cats AS hasFood ORDER BY g2""".stripMargin)
    // standalone / CALL-tail positions
    show("UNWIND [1,2,3] AS x WITH collect(x) AS xs " +
      "RETURN 2 IN xs AS has2, 9 IN xs AS has9")
    show("UNWIND [1,2,3] AS x WITH collect(x) AS xs WITH xs " +
      "WHERE 2 IN xs RETURN size(xs) AS n")
    spark.stop()
  }
}
