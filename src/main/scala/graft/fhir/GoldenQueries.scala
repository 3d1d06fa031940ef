package graft.fhir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph

/** The reference's 10 golden questions (src/tests/test_data.py:6-47)
  * as declarative DataFrame programs over the property graph — the
  * shapes its Text2Cypher path generates, compiled to joins by hand
  * (the engine's graph-query surface; the LLM boundary stays outside).
  *
  * Naming: p = Patient, i = Immunization, a = Allergy, s = Substance,
  * pr = Practitioner, ad = Address; edge frames carry (src, dst).
  */
object GoldenQueries {

  private def nodes(g: PropertyGraph, l: String) = g.nodes(l)
  private def edges(g: PropertyGraph, r: String) = g.edges(r)._3

  /** Q1: patients surnamed Rosenbaum with >1 immunization → count. */
  def q1RosenbaumMultiImmunization(g: PropertyGraph): Long =
    nodes(g, "Patient").filter(col("surname") === "Rosenbaum")
      .join(edges(g, "HAS_IMMUNIZATION"), col("id") === col("src"))
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()

  /** Q2: full names of patients treated by practitioner Josef Klein. */
  def q2TreatedByJosefKlein(g: PropertyGraph): Set[String] = {
    val pr = nodes(g, "Practitioner")
      .filter(col("givenName") === "Josef" && col("surname") === "Klein")
    pr.join(edges(g, "TREATS"), col("id") === col("src"))
      .join(nodes(g, "Patient").as("p"), col("dst") === col("p.id"))
      .select(concat_ws(" ", col("p.givenName"), col("p.surname")).as("full"))
      .distinct().collect().map(_.getString(0)).toSet
  }

  /** Q3: did Arla Fritsch treat more than one patient? */
  def q3ArlaFritschMultiple(g: PropertyGraph): Boolean =
    nodes(g, "Practitioner")
      .filter(col("givenName") === "Arla" && col("surname") === "Fritsch")
      .join(edges(g, "TREATS"), col("id") === col("src"))
      .select(col("dst")).distinct().count() > 1

  /** Q4: unique allergy substance categories. */
  def q4AllergyCategories(g: PropertyGraph): Set[String] =
    nodes(g, "Allergy").filter(col("category").isNotNull)
      .select("category").distinct().collect().map(_.getString(0)).toSet

  /** Q5: patients born between 1990 and 2000 (inclusive years). */
  def q5Born1990To2000(g: PropertyGraph): Long =
    nodes(g, "Patient")
      .filter(year(col("birthDate")).between(1990, 2000))
      .count()

  /** Q6: immunizations after 2022-01-01 — the published 65 counts
    * (p)-[:HAS_IMMUNIZATION]->(i) matches (= immunization nodes, the
    * edge is 1:1 here), not distinct patients (60).
    */
  def q6ImmunizedAfter2022(g: PropertyGraph): Long =
    edges(g, "HAS_IMMUNIZATION")
      .join(nodes(g, "Immunization"), col("dst") === col("id"))
      .filter(col("occurrenceDateTime") > to_timestamp(lit("2022-01-01")))
      .count()

  /** Q7: practitioner with most patients → (full name, n). */
  def q7TopPractitioner(g: PropertyGraph): (String, Long) = {
    val row = edges(g, "TREATS")
      .groupBy("src").agg(countDistinct(col("dst")).as("n"))
      .join(nodes(g, "Practitioner"), col("src") === col("id"))
      .orderBy(col("n").desc, col("id").asc)
      .select(concat_ws(" ", col("givenName"), col("surname")).as("full"), col("n"))
      .head()
    (row.getString(0), row.getLong(1))
  }

  /** Q8: patient 45's shellfish allergy → (city, state, practitioner).
    * ONE pattern call: the generated Cypher's mixed arrowheads
    * (`(s:Substance)-[:CAUSES]->(a:Allergy)<-[:EXPERIENCES]-
    * (p:Patient)`, reference rag.baml:279) plus the patient's
    * address and practitioner as BRANCHES off `p` — a tree pattern
    * with a mid-chain predicate (`p.id = 45`), expressible since the
    * matchPaths DSL (round 5); previously three matchPattern calls.
    * An empty path set (no shellfish allergy) fails the require.
    */
  def q8Patient45Shellfish(g: PropertyGraph): (String, String, String) = {
    import PropertyGraph.{In, Out, PatternNode, PatternStep}
    val paths = g.matchPaths(
      PatternNode("Substance", "s", Some(col("id") === "shellfish")),
      Seq(
        PatternStep("CAUSES", Out, PatternNode("Allergy", "a")),
        PatternStep("EXPERIENCES", In, PatternNode("Patient", "p", Some(col("id") === 45))),
        PatternStep("LIVES_IN", Out, PatternNode("Address", "ad"), from = Some("p")),
        PatternStep("TREATS", In, PatternNode("Practitioner", "pr"), from = Some("p"))))
    val rows = g.attach(
        g.attach(paths, "ad", "Address", Seq("city", "state")),
        "pr", "Practitioner", Seq("givenName", "surname"))
      .select(col("city"), col("state"),
        concat_ws(" ", col("givenName"), col("surname")).as("prac"))
      .distinct().collect()
    require(rows.nonEmpty, "patient 45 has no shellfish allergy")
    require(rows.length == 1, s"ambiguous q8 result: ${rows.mkString(";")}")
    (rows(0).getString(0), rows(0).getString(1), rows(0).getString(2))
  }

  /** Q9: immunization matches whose traits mention influenza. The
    * published 204 is unreachable by ANY deterministic upsert: the
    * traits of two record_id_status nodes are contested between rows,
    * and first-write (this engine) gives 205, last-write 203 — Kuzu's
    * arbitrary intra-batch MERGE order happened to split them. See
    * FhirPipeline scaladoc.
    */
  def q9InfluenzaImmunized(g: PropertyGraph): Long =
    edges(g, "HAS_IMMUNIZATION")
      .join(nodes(g, "Immunization"), col("dst") === col("id"))
      .filter(col("traits").contains("influenza"))
      .count()

  /** Q10: substances causing allergies in category 'food'. */
  def q10FoodSubstances(g: PropertyGraph): Long =
    edges(g, "CAUSES")
      .join(nodes(g, "Allergy"), col("dst") === col("id"))
      .filter(col("category") === "food")
      .select(col("src")).distinct()
      .count()
}
