package graft

import org.apache.spark.sql.functions._

import graft.extract.Extraction
import graft.fhir.GoldExtract

/** Raw-FHIR-bundle gold extractors (reference
  * baml_extract_eval.py:205-324) — G5: the eval harness must be able
  * to score extraction against gold values pulled from raw bundles,
  * not only against already-extracted JSON.
  */
class GoldExtractSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val fullBundle =
    """{"resourceType":"Bundle","entry":[
      |{"resource":{"resourceType":"Patient","gender":"female","birthDate":"1987-03-14",
      |  "name":[{"family":"Smith","given":["Ann","B."],"prefix":["Ms."]}]}},
      |{"resource":{"resourceType":"Practitioner",
      |  "name":[{"family":"Klein","given":["Josef"],"prefix":["Dr."]}]}},
      |{"resource":{"resourceType":"Encounter","participant":[
      |  {"individual":{"display":"Dr. Arla Fritsch"}},
      |  {"individual":{"display":"Dr. Josef Klein"}}]}},
      |{"resource":{"resourceType":"Immunization","status":"completed",
      |  "occurrenceDateTime":"2022-05-01T10:00:00+01:00"}},
      |{"resource":{"resourceType":"Immunization","status":"",
      |  "occurrenceString":"spring 2021"}},
      |{"resource":{"resourceType":"Procedure","code":{"text":"Influenza vaccine administration"}}},
      |{"resource":{"resourceType":"Procedure","code":{"text":"X-ray",
      |  "coding":[{"display":"Immunization follow-up"}]}}},
      |{"resource":{"resourceType":"Procedure","code":{"text":"Appendectomy"}}},
      |{"resource":{"resourceType":"AllergyIntolerance"}},
      |{"resource":{"resourceType":"AllergyIntolerance"}}
      |]}""".stripMargin.replace("\n", "")

  private val notABundle = """{"resourceType":"Patient","gender":"male"}"""

  private lazy val parsed = Seq((1L, fullBundle), (2L, notABundle))
    .toDF("record_id", "fhir")
    .select(col("record_id"), GoldExtract.parseBundle(col("fhir")).as("b"))

  test("counts: allergies, immunizations incl. vaccine-mentioning procedures") {
    val row = parsed.select(
      col("record_id"),
      GoldExtract.allergyCount(col("b")).as("al"),
      GoldExtract.immunizationCount(col("b")).as("im"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(row(1L) === ((2, 4)), "2 Immunization + vaccine-text + coding-display Procedures")
    assert(row(2L) === ((0, 0)), "non-Bundle roots contribute nothing")
  }

  test("immunization statuses and dates: truthy-only, dateTime over string") {
    val r = parsed.filter(col("record_id") === 1L).select(
      GoldExtract.immunizationStatuses(col("b")).as("st"),
      GoldExtract.immunizationDates(col("b")).as("dt"))
      .as[(Seq[String], Seq[String])].head()
    assert(r._1 === Seq("completed"), "empty-string status is falsy (py truthiness)")
    assert(r._2 === Seq("2022-05-01T10:00:00+01:00", "spring 2021"),
      "occurrenceString is the fallback when dateTime is absent")
  }

  test("practitioners: Encounter displays union combined Practitioner names") {
    val got = parsed.filter(col("record_id") === 1L)
      .select(GoldExtract.practitioners(col("b")))
      .as[Seq[String]].head()
    assert(got === Seq("dr. arla fritsch", "dr. josef klein"),
      "combined 'dr. josef klein' must dedup against the Encounter display")
  }

  test("practitioner address union (struct | string) survives ingest") {
    // extract_fhir.baml:35-40 allows `address Address | string`; a
    // struct-only schema silently nulled string addresses out.
    val fixture =
      """[{"record_id":1,"practitioner":{"name":{"family":"Klein","given":["Josef"],"prefix":"Dr."},
        |  "address":{"line":"1 Way","city":"Boston","state":"MA","postalCode":"02111","country":"US"}}},
        | {"record_id":2,"practitioner":{"name":{"family":"Reilly","given":["Ted"],"prefix":"Dr."},
        |  "address":"99 Elm St, Salem"}}]""".stripMargin
    val f = java.io.File.createTempFile("prac_union", ".json")
    java.nio.file.Files.writeString(f.toPath, fixture)
    try {
      val prac = graft.fhir.FhirPipeline.prepPractitioner(
        graft.fhir.FhirPipeline.load(spark, f.getAbsolutePath))
      val byId = prac.select(col("record_id"), col("address.line"), col("address.city"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
      assert(byId(1L) === (("1 Way", Some("Boston"))), "struct-shaped address parses")
      assert(byId(2L) === (("99 Elm St, Salem", None)),
        "bare-string address lands in line instead of nulling out")
    } finally f.delete()
  }

  test("gold patient feeds fieldAccuracy end-to-end from raw bundles") {
    val gold = parsed.select(
      col("record_id"),
      GoldExtract.goldPatient(col("b")).getField("gender").as("gender"),
      GoldExtract.goldPatient(col("b")).getField("birthDate").as("birthDate"))
    val extracted = Seq(
      (1L, "female", "1987-03-15"), // gender right, date off by one
      (2L, null.asInstanceOf[String], null.asInstanceOf[String]) // both-null matches gold nulls
    ).toDF("record_id", "gender", "birthDate")
    val acc = Extraction.fieldAccuracy(extracted, gold,
      Seq("gender" -> "gender", "birthDate" -> "birthDate"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(acc("gender") === ((2L, 2L)), "null gender == null gold counts as match")
    assert(acc("birthDate") === ((1L, 2L)))
  }
}
