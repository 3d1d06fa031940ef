package graft

import graft.fhir.{FhirPipeline, GoldenQueries}

/** End-to-end parity: ingest the reference's extracted FHIR corpus,
  * build the property graph, and assert the 10 golden answers
  * (BASELINE.md, reference src/tests/test_data.py).
  */
class FhirGoldenSpec extends SparkSpec {

  private lazy val graph = {
    val df = FhirPipeline.load(spark, "/root/reference/data/extracted_fhir.json")
    val g = FhirPipeline.buildGraph(df)
    // cache node/edge tables: 11 downstream queries reuse them (the
    // reference re-reads staging frames across its 11 ingests too)
    g.nodes.values.foreach(_.cache())
    g.edges.values.foreach(_._3.cache())
    g
  }

  test("corpus loads 2726 records with declared schema") {
    val df = FhirPipeline.load(spark, "/root/reference/data/extracted_fhir.json")
    assert(df.count() === 2726)
  }

  test("golden 1: one Rosenbaum patient with multiple immunizations") {
    assert(GoldenQueries.q1RosenbaumMultiImmunization(graph) === 1L)
  }

  test("golden 2: patients treated by Josef Klein include the 4 expected names") {
    // The reference harness passes iff the expected values APPEAR in
    // the answer (test_graphrag.py:38-53) — dr._josef_klein actually
    // treats 8 distinct patients and the golden list names 4 of them.
    val got = GoldenQueries.q2TreatedByJosefKlein(graph)
    val expected = Set("Lili Abbie Brekke", "Marinda Lindsay Veum",
      "Gary Everette Abshire", "Gabrielle Claudie Medhurst")
    assert(expected.subsetOf(got), s"missing: ${expected.diff(got)}")
    assert(got.size === 8)
  }

  test("golden 3: Arla Fritsch treated more than one patient") {
    assert(GoldenQueries.q3ArlaFritschMultiple(graph))
  }

  test("golden 4: unique allergy categories") {
    assert(GoldenQueries.q4AllergyCategories(graph) ===
      Set("medication", "environment", "food", "other"))
  }

  test("golden 5: 184 patients born 1990-2000") {
    assert(GoldenQueries.q5Born1990To2000(graph) === 184L)
  }

  test("golden 6: 65 immunizations after 2022-01-01") {
    assert(GoldenQueries.q6ImmunizedAfter2022(graph) === 65L)
  }

  test("golden 7: Ted Reilly treated the most patients (19)") {
    assert(GoldenQueries.q7TopPractitioner(graph) === ("Ted Reilly", 19L))
  }

  test("golden 8: patient 45 shellfish → East Longmeadow / Massachusetts / Cletus Paucek") {
    assert(GoldenQueries.q8Patient45Shellfish(graph) ===
      (("East Longmeadow", "Massachusetts", "Cletus Paucek")))
  }

  test("golden 8 through the TEXTUAL Cypher route — the Text2Cypher contract") {
    // the exact statement shape the reference's LLM generates
    // (rag.baml:279 arrowheads; branches as comma-separated parts),
    // parsed by CypherLite and compiled onto matchPaths
    val rows = graft.graph.CypherLite.query(graph,
      """MATCH (s:Substance {id: 'shellfish'})-[:CAUSES]->(a:Allergy)
        |      <-[:EXPERIENCES]-(p:Patient {id: 45}),
        |      (p)-[:LIVES_IN]->(ad:Address), (p)<-[:TREATS]-(pr:Practitioner)
        |RETURN ad.city, ad.state, pr.givenName, pr.surname""".stripMargin)
      .distinct().collect()
    assert(rows.length === 1)
    assert(rows(0).toSeq === Seq("East Longmeadow", "Massachusetts", "Cletus", "Paucek"))
  }

  test("golden 8 through the MANDATED toLower CONTAINS form (rag.baml:76-79,279)") {
    // the shape the Text2Cypher prompt REQUIRES for every string
    // predicate: lowercase both sides, compare with CONTAINS — the
    // worked example rag.baml:279 verbatim (s.name, not an id lookup)
    val rows = graft.graph.CypherLite.query(graph,
      """MATCH (s:Substance)-[:CAUSES]->(a:Allergy)<-[:EXPERIENCES]-(p:Patient),
        |      (p)-[:LIVES_IN]->(ad:Address), (p)<-[:TREATS]-(pr:Practitioner)
        |WHERE toLower(s.name) CONTAINS toLower('Shellfish') AND p.id = 45
        |RETURN ad.city, ad.state, pr.givenName, pr.surname""".stripMargin)
      .distinct().collect()
    assert(rows.length === 1)
    assert(rows(0).toSeq === Seq("East Longmeadow", "Massachusetts", "Cletus", "Paucek"))
  }

  test("golden 9: influenza immunizations = 205 under deterministic first-write " +
      "(published 204 is a Kuzu intra-batch MERGE-order artifact; last-write gives 203)") {
    assert(GoldenQueries.q9InfluenzaImmunized(graph) === 205L)
  }

  test("golden 10: 13 substances cause food allergies") {
    assert(GoldenQueries.q10FoodSubstances(graph) === 13L)
  }

  // ------------------------------------------------------------------
  // The FULL golden corpus through literal Cypher text — the
  // Text2Cypher compile target (reference src/tests/test_data.py:6-47).
  // Each question below runs as a Cypher STRING parsed and executed by
  // CypherLite, in the shapes the reference's prompt mandates
  // (toLower/CONTAINS for strings, CAST(… AS DATE|TIMESTAMP) for
  // datetimes, WITH for pipelined aggregation). Answers match the
  // published golden values (q9: documented first-write divergence).
  // ------------------------------------------------------------------

  private def cypher(stmt: String) = graft.graph.CypherLite.query(graph, stmt)

  private def singleLong(stmt: String): Long =
    cypher(stmt).collect() match { case Array(r) => r.getLong(0) }

  test("text golden 1: Rosenbaum multi-immunization count via WITH … WHERE") {
    assert(singleLong(
      """MATCH (p:Patient)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |WHERE p.surname = 'Rosenbaum'
        |WITH p, count(i) AS n WHERE n > 1
        |RETURN count(*) AS n_patients""".stripMargin) === 1L)
  }

  test("text golden 2: patients treated by Josef Klein (mandated toLower form)") {
    val got = cypher(
      """MATCH (pr:Practitioner)-[:TREATS]->(p:Patient)
        |WHERE toLower(pr.givenName) CONTAINS toLower('Josef')
        |  AND toLower(pr.surname) CONTAINS toLower('Klein')
        |RETURN DISTINCT p.givenName AS g, p.surname AS s""".stripMargin)
      .collect().map(r => s"${r.getString(0)} ${r.getString(1)}").toSet
    val expected = Set("Lili Abbie Brekke", "Marinda Lindsay Veum",
      "Gary Everette Abshire", "Gabrielle Claudie Medhurst")
    assert(expected.subsetOf(got), s"missing: ${expected.diff(got)}")
    assert(got.size === 8)
  }

  test("text golden 3: Arla Fritsch treated more than one patient") {
    assert(singleLong(
      """MATCH (pr:Practitioner)-[:TREATS]->(p:Patient)
        |WHERE pr.givenName = 'Arla' AND pr.surname = 'Fritsch'
        |RETURN count(DISTINCT p) AS n""".stripMargin) > 1L)
  }

  test("text golden 4: unique allergy categories via single-node MATCH") {
    val got = cypher(
      """MATCH (a:Allergy) WHERE a.category IS NOT NULL
        |RETURN DISTINCT a.category AS category""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("medication", "environment", "food", "other"))
  }

  test("text golden 5: 184 patients born 1990-2000 via CAST date literals") {
    assert(singleLong(
      """MATCH (p:Patient)
        |WHERE p.birthDate >= CAST('1990-01-01' AS DATE)
        |  AND p.birthDate <= CAST('2000-12-31' AS DATE)
        |RETURN count(*) AS n""".stripMargin) === 184L)
  }

  test("text golden 6: 65 immunizations after 2022-01-01 via CAST timestamp") {
    assert(singleLong(
      """MATCH (p:Patient)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |WHERE i.occurrenceDateTime > CAST('2022-01-01' AS TIMESTAMP)
        |RETURN count(*) AS n""".stripMargin) === 65L)
  }

  test("text golden 7: top practitioner via WITH argmax (test_data.py:31-34 shape)") {
    val rows = cypher(
      """MATCH (pr:Practitioner)-[:TREATS]->(p:Patient)
        |WITH pr, count(DISTINCT p) AS n ORDER BY n DESC, pr ASC LIMIT 1
        |RETURN pr.givenName AS g, pr.surname AS s, n""".stripMargin).collect()
    assert(rows.length === 1)
    assert((s"${rows(0).getString(0)} ${rows(0).getString(1)}", rows(0).getLong(2)) ===
      (("Ted Reilly", 19L)))
  }

  test("text golden 7b: argmax in the raw LLM-emitted form — un-aliased " +
      "count + structural ORDER BY") {
    // the shape Text2Cypher models actually emit (no AS, ORDER BY the
    // aggregate expression): un-aliased aggregates take sanitized
    // default names and ORDER BY count(DISTINCT p) resolves to the
    // item with the same aggregate shape
    val rows = cypher(
      """MATCH (pr:Practitioner)-[:TREATS]->(p:Patient)
        |WITH pr, count(DISTINCT p) ORDER BY count(DISTINCT p) DESC, pr ASC LIMIT 1
        |RETURN pr.givenName AS g, pr.surname AS s,
        |       count_distinct_p AS n""".stripMargin).collect()
    assert(rows.length === 1)
    assert((s"${rows(0).getString(0)} ${rows(0).getString(1)}", rows(0).getLong(2)) ===
      (("Ted Reilly", 19L)))
  }

  test("text golden 9: influenza immunizations = 205 (documented first-write divergence)") {
    assert(singleLong(
      """MATCH (p:Patient)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |WHERE toLower(i.traits) CONTAINS toLower('influenza')
        |RETURN count(*) AS n""".stripMargin) === 205L)
  }

  test("text golden 10: 13 substances cause food allergies") {
    assert(singleLong(
      """MATCH (s:Substance)-[:CAUSES]->(a:Allergy)
        |WHERE a.category = 'food'
        |RETURN count(DISTINCT s) AS n""".stripMargin) === 13L)
  }

  test("golden answers survive round-13 LLM paraphrases") {
    // the SAME golden answers through the decorated syntax real
    // Text2Cypher output carries — legacy size() degree, chained
    // comparisons, temporal component maps, label predicates, and
    // type(r) absorption must not change a single number
    // golden 1 via the legacy degree form
    assert(singleLong(
      """/* multi-immunization */ MATCH (p:Patient)
        |WHERE p.surname = "Rosenbaum"
        |  AND size((p)-[:HAS_IMMUNIZATION]->()) > 1
        |RETURN count(*) AS n""".stripMargin) === 1L)
    // golden 5 via a chained comparison over date() constructors
    assert(singleLong(
      """MATCH (p:Patient)
        |WHERE date('1990-01-01') <= p.birthDate <= date('2000-12-31')
        |RETURN count(*) AS n""".stripMargin) === 184L)
    // golden 6 via the datetime component-map constructor
    assert(singleLong(
      """MATCH (p:Patient)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |WHERE i.occurrenceDateTime >
        |      datetime({year: 2022, month: 1, day: 1})
        |RETURN count(*) AS n""".stripMargin) === 65L)
    // golden 4 via an absorbed label predicate
    val cats = cypher(
      """MATCH (a) WHERE a:Allergy AND a.category IS NOT NULL
        |RETURN DISTINCT a.category AS category""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(cats === Set("medication", "environment", "food", "other"))
    // golden 3 via type(r) absorption onto an untyped edge
    assert(singleLong(
      """MATCH (pr:Practitioner)-[r]->(p)
        |WHERE type(r) = 'TREATS' AND pr.givenName = 'Arla'
        |  AND pr.surname = 'Fritsch'
        |RETURN count(DISTINCT p) AS n""".stripMargin) > 1L)
  }

  test("golden answers survive round-14 LLM paraphrases") {
    // golden 5 via a head-WITH named constant pair (the
    // bind-the-cutoffs idiom)
    assert(singleLong(
      """WITH date('1990-01-01') AS lo, date('2000-12-31') AS hi
        |MATCH (p:Patient)
        |WHERE p.birthDate >= lo AND p.birthDate <= hi
        |RETURN count(*) AS n""".stripMargin) === 184L)
    // golden 1 via the COLLECT{} subquery + size()
    assert(singleLong(
      """MATCH (p:Patient) WHERE p.surname = 'Rosenbaum'
        |  AND size(COLLECT { MATCH (p)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |                     RETURN i }) > 1
        |RETURN count(*) AS n""".stripMargin) === 1L)
    // golden 6 via CASE-in-WHERE (the projected-predicate spelling)
    assert(singleLong(
      """MATCH (p:Patient)-[:HAS_IMMUNIZATION]->(i:Immunization)
        |WHERE CASE WHEN i.occurrenceDateTime >
        |      datetime('2022-01-01T00:00:00') THEN 1 ELSE 0 END = 1
        |RETURN count(*) AS n""".stripMargin) === 65L)
    // golden 4 via upper() SQL-ism + DISTINCT
    val cats = cypher(
      """MATCH (a:Allergy) WHERE a.category IS NOT NULL
        |RETURN DISTINCT lower(a.category) AS category""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(cats === Set("medication", "environment", "food", "other"))
  }

  test("golden answers survive round-15 LLM paraphrases") {
    // golden 5 via temporal component accessors — year range instead
    // of date bounds (equivalent on this data: birthDate year in
    // [1990, 2000] ⇔ the golden date-literal range)
    assert(singleLong(
      """MATCH (p:Patient)
        |WHERE p.birthDate.year >= 1990 AND p.birthDate.year <= 2000
        |RETURN count(*) AS n""".stripMargin) === 184L)
    // the same via CONSTRUCTOR component folds (the age-arithmetic
    // idiom: date('…').year folds to a literal at parse)
    assert(singleLong(
      """MATCH (p:Patient)
        |WHERE p.birthDate.year >= date('1990-06-15').year
        |  AND p.birthDate.year <= date('2000-03-01').year
        |RETURN count(*) AS n""".stripMargin) === 184L)
    // the age question over the sparse birthDate column — the
    // duration.between emission; 138 patients are 80+ on 2024-01-01
    // (independently computed from the raw corpus with java-Period
    // whole-month counting)
    assert(singleLong(
      """MATCH (p:Patient)
        |WHERE p.birthDate IS NOT NULL
        |  AND duration.between(p.birthDate, date('2024-01-01')).years >= 80
        |RETURN count(*) AS n""".stripMargin) === 138L)
    // trait tallying via size(split(…)) under an aggregate — the
    // list-measure emission over the joined traits column (519 raw
    // instances collapse to 411 first-write nodes; avg tokens 2.879…
    // pinned to 3 significant checks: non-null, > 2.8, < 3.0)
    val avgTraits = cypher(
      """MATCH (i:Immunization) WHERE i.traits IS NOT NULL
        |RETURN avg(size(split(i.traits, ', '))) AS a""".stripMargin)
      .collect()(0).getDouble(0)
    assert(avgTraits > 2.8 && avgTraits < 3.0)
  }

  test("schema XML introspection lists all node and rel tables") {
    val xml = graph.schemaXml
    for (l <- Seq("Address", "Patient", "Practitioner", "Substance", "Allergy", "Immunization"))
      assert(xml.contains(s"""<node label="$l">"""))
    for (r <- Seq("LIVES_IN", "TREATS", "EXPERIENCES", "CAUSES", "HAS_IMMUNIZATION"))
      assert(xml.contains(s"""<rel label="$r""""))
    assert(xml.contains("""<property name="birthDate" type="date"/>"""))
  }
}
