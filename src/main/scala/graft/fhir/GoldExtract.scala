package graft.fhir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gold-side extractors over RAW FHIR bundles (reference
  * baml_extract_eval.py:205-324): the eval harness pulls reference
  * values straight out of `Bundle.entry[].resource` JSON — patient
  * demographics, allergy/immunization counts, immunization
  * status/date lists, practitioner display names from Encounter
  * participants — to score the LLM extraction against.
  *
  * Spark-first: one `from_json` with an explicit pruned schema (never
  * inferSchema — FIXTURES.md rule), then pure higher-order array
  * expressions per resource type. Everything is a Column function, so
  * gold extraction composes into the same select as the accuracy
  * join; nothing leaves the executors.
  */
object GoldExtract {

  /** FHIR name element: family + given[] + prefix[] (FIXTURES.md §5;
    * prefix-as-array is the FHIR-standard variant the reference
    * normalizes at baml_extract_eval.py:180-182).
    */
  private val personName = StructType(Seq(
    StructField("family", StringType),
    StructField("given", ArrayType(StringType)),
    StructField("prefix", ArrayType(StringType))))

  /** Pruned union of the resource fields the gold extractors touch. */
  private val resourceSchema = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("name", ArrayType(personName)),
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("status", StringType),
    StructField("occurrenceDateTime", StringType),
    StructField("occurrenceString", StringType),
    StructField("code", StructType(Seq(
      StructField("text", StringType),
      StructField("coding", ArrayType(StructType(Seq(
        StructField("display", StringType)))))))),
    StructField("participant", ArrayType(StructType(Seq(
      StructField("individual", StructType(Seq(
        StructField("display", StringType))))))))))

  val bundleSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("entry", ArrayType(StructType(Seq(
      StructField("resource", resourceSchema)))))))

  /** Parse a raw bundle JSON string column. */
  def parseBundle(json: Column): Column = from_json(json, bundleSchema)

  private def truthy(s: Column): Column = s.isNotNull && length(s) > 0

  /** Resources of one type; non-Bundle roots yield the empty array
    * (the reference's `resourceType != "Bundle"` early returns).
    */
  def resourcesOfType(bundle: Column, tpe: String): Column = {
    val rs = transform(
      when(bundle.getField("resourceType") === "Bundle",
        coalesce(bundle.getField("entry"),
          array().cast(bundleSchema("entry").dataType)))
        .otherwise(array().cast(bundleSchema("entry").dataType)),
      e => e.getField("resource"))
    filter(rs, r => r.getField("resourceType") === tpe)
  }

  /** First Patient resource (extract_patient_from_bundle, :211-218).
    * try_element_at: a bundle without a Patient yields NULL, not an
    * ANSI out-of-bounds error.
    */
  def goldPatient(bundle: Column): Column =
    try_element_at(resourcesOfType(bundle, "Patient"), lit(1))

  /** AllergyIntolerance count (:221-231). */
  def allergyCount(bundle: Column): Column =
    size(resourcesOfType(bundle, "AllergyIntolerance"))

  /** Immunization count: Immunization resources PLUS Procedure
    * resources whose code text or any coding display mentions
    * vaccine/immunization (:234-258).
    */
  def immunizationCount(bundle: Column): Column = {
    def mentions(s: Column) =
      lower(coalesce(s, lit(""))).contains("vaccine") ||
        lower(coalesce(s, lit(""))).contains("immunization")
    val vaccineProcedures = filter(resourcesOfType(bundle, "Procedure"), r =>
      mentions(r.getField("code").getField("text")) ||
        exists(coalesce(r.getField("code").getField("coding"),
          array().cast(ArrayType(StructType(Seq(StructField("display", StringType)))))),
          c => mentions(c.getField("display"))))
    size(resourcesOfType(bundle, "Immunization")) + size(vaccineProcedures)
  }

  /** Statuses of Immunization resources, truthy only (:261-271). */
  def immunizationStatuses(bundle: Column): Column =
    filter(
      transform(resourcesOfType(bundle, "Immunization"), r => r.getField("status")),
      truthy(_))

  /** occurrenceDateTime (else occurrenceString) per Immunization,
    * truthy only (:274-291).
    */
  def immunizationDates(bundle: Column): Column =
    filter(
      transform(resourcesOfType(bundle, "Immunization"), r =>
        when(truthy(r.getField("occurrenceDateTime")), r.getField("occurrenceDateTime"))
          .when(truthy(r.getField("occurrenceString")), r.getField("occurrenceString"))),
      _.isNotNull)

  /** `combine_practitioner_name` (:170-202): first name element's
    * prefix[0] + given… + family, space-joined, lowered.
    */
  private def combinedName(name: Column): Column = {
    val noStrings = array().cast(ArrayType(StringType))
    val parts = filter(
      concat(
        coalesce(slice(name.getField("prefix"), 1, 1), noStrings),
        coalesce(name.getField("given"), noStrings),
        coalesce(array(name.getField("family")), noStrings)),
      truthy(_))
    lower(concat_ws(" ", parts))
  }

  /** Distinct practitioner display names: Encounter participant
    * displays (lowered) ∪ combined Practitioner resource names
    * (:294-321). The reference returns an unordered set; sorted here
    * so downstream comparisons are deterministic.
    */
  def practitioners(bundle: Column): Column = {
    val fromEncounters = flatten(transform(
      resourcesOfType(bundle, "Encounter"), r =>
        transform(
          coalesce(r.getField("participant"),
            array().cast(resourceSchema("participant").dataType)),
          p => lower(p.getField("individual").getField("display")))))
    val fromPractitioners = transform(
      resourcesOfType(bundle, "Practitioner"), r =>
        combinedName(try_element_at(r.getField("name"), lit(1))))
    array_sort(array_distinct(
      filter(concat(fromEncounters, fromPractitioners), truthy(_))))
  }
}
