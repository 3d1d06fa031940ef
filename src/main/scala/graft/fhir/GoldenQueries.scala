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
    * Expressed through the direction-aware pattern API — the generated
    * Cypher mixes arrowheads (`(s:Substance)-[:CAUSES]->(a:Allergy)
    * <-[:EXPERIENCES]-(p:Patient)`, reference rag.baml:279), which
    * maps to Out/In steps.
    */
  def q8Patient45Shellfish(g: PropertyGraph): (String, String, String) = {
    import PropertyGraph.{In, Out}
    val hasShellfish = g.matchPattern("Substance", col("id") === "shellfish",
        Seq("CAUSES" -> Out, "EXPERIENCES" -> In))
      .filter(col("id") === 45)
      .limit(1).count() > 0
    require(hasShellfish, "patient 45 has no shellfish allergy")
    val home = g.matchPattern("Patient", col("id") === 45, Seq("LIVES_IN" -> Out))
      .select("city", "state").head()
    val prac = g.matchPattern("Patient", col("id") === 45, Seq("TREATS" -> In))
      .select(concat_ws(" ", col("givenName"), col("surname"))).head().getString(0)
    (home.getString(0), home.getString(1), prac)
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
