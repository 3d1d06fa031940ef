package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Guardrails

/** Structured extraction stage (reference src/baml_extract.py): free
  * clinical note → typed record, re-expressed Spark-first.
  *
  * The reference fans out per-record LLM calls with asyncio
  * (baml_extract.py:66-68) and shell-parallel batches (run.sh); here
  * the unit of parallelism is the PARTITION — `mapPartitions` with a
  * per-partition extractor handle (the place a real client would open
  * its connection pool once, not per row). The `Extractor` seam keeps
  * the LLM boundary out of the engine: CI always runs the
  * deterministic rule-based implementation (zero egress, SURVEY §7.4).
  *
  * The rule-based extractor is an honest regex baseline, not an LLM
  * replacement: it extracts the pattern-stable fields (phone, email,
  * gender, marital status, language, prefix, birth date) and its
  * accuracy vs. the LLM gold output is MEASURED by FieldAccuracy (the
  * reference's eval harness shape, baml_extract_eval.py:338-387) —
  * the number is a floor, not a claim of parity.
  */
object Extraction {

  case class NoteRecord(record_id: Long, note: String)

  case class ExtractedRecord(
      record_id: Long,
      prefix: Option[String],
      gender: Option[String],
      birthDate: Option[String],
      phone: Option[String],
      email: Option[String],
      maritalStatus: Option[String],
      primaryLanguage: Option[String])

  /** The LLM-boundary seam (reference BAML functions L1-L3). */
  trait Extractor extends Serializable {
    def extract(note: NoteRecord): ExtractedRecord
  }

  /** Deterministic regex extraction of the pattern-stable fields. */
  object RuleBasedExtractor extends Extractor {
    private val Phone = """\b\d{3}-\d{3}-\d{4}\b""".r
    private val Born = """born on (January|February|March|April|May|June|July|August|September|October|November|December) (\d{1,2}), (\d{4})""".r
    private val Months = Seq("January", "February", "March", "April", "May",
      "June", "July", "August", "September", "October", "November",
      "December").zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap
    private val PatientPrefix = """\b(Mr\.|Mrs\.|Ms\.)""".r

    def extract(n: NoteRecord): ExtractedRecord = {
      val note = n.note
      val gender =
        if ("""(?i)\bfemale\b""".r.findFirstIn(note).isDefined) Some("Female")
        else if ("""(?i)\bmale\b""".r.findFirstIn(note).isDefined) Some("Male")
        else None
      val marital =
        if (note.contains("Divorced") || note.contains("divorced")) Some("Divorced")
        else if (note.contains("Widowed") || note.contains("widowed")) Some("Widowed")
        else if ("""(?i)never married""".r.findFirstIn(note).isDefined) Some("NeverMarried")
        else if (note.contains("Married") || note.contains("married")) Some("Married")
        else None
      val lang =
        if (note.contains("English")) Some("English")
        else if (note.contains("Spanish")) Some("Spanish")
        else None
      val birth = Born.findFirstMatchIn(note).map { m =>
        f"${m.group(3)}-${Months(m.group(1))}%02d-${m.group(2).toInt}%02d"
      }
      ExtractedRecord(
        record_id = n.record_id,
        prefix = PatientPrefix.findFirstIn(note),
        gender = gender,
        birthDate = birth,
        phone = Phone.findFirstIn(note),
        email = Guardrails.findEmails(note).headOption,
        maritalStatus = marital,
        primaryLanguage = lang)
    }
  }

  /** Partition-parallel extraction (the asyncio fan-out analog). */
  def run(notes: Dataset[NoteRecord], extractor: Extractor): Dataset[ExtractedRecord] = {
    import notes.sparkSession.implicits._
    notes.mapPartitions { it =>
      // per-partition extractor/client setup happens here, once
      it.map(extractor.extract)
    }
  }

  def loadNotes(spark: SparkSession, path: String): Dataset[NoteRecord] = {
    import spark.implicits._
    graft.core.IO.readJsonArray(spark, path,
      org.apache.spark.sql.types.StructType.fromDDL("record_id BIGINT, note STRING"))
      .as[NoteRecord]
  }

  /** Field-accuracy eval (reference FIELD_MAP comparators,
    * baml_extract_eval.py:557-639): join extracted vs gold on
    * record_id, per-field boolean match, tallied long-form as
    * (field, n_match, n_total, accuracy). Gold nulls compare equal to
    * extracted nulls (the reference's both-missing-is-correct rule).
    */
  def fieldAccuracy(extracted: DataFrame, gold: DataFrame,
      fields: Seq[(String, String)]): DataFrame = {
    // ONE join + ONE aggregation for every field (a per-field
    // agg-union would rescan the join once per field — fields× full
    // passes at corpus scale), then stack() unpivots the single row
    // to the long (field, n_match, n_total, accuracy) form.
    val joined = extracted.as("x").join(gold.as("g"), "record_id")
    val matchCols = fields.zipWithIndex.map { case ((xf, gf), i) =>
      sum(when(col(s"x.$xf") <=> col(s"g.$gf"), 1L).otherwise(0L)).as(s"m_$i")
    }
    val row = joined.agg(matchCols.head, (matchCols.tail :+ count(lit(1)).as("n_total")): _*)
    val stackArgs = fields.zipWithIndex
      .map { case ((xf, _), i) => s"'$xf', m_$i" }.mkString(", ")
    row.select(
        expr(s"stack(${fields.size}, $stackArgs) AS (field, n_match)"),
        col("n_total"))
      .withColumn("accuracy", col("n_match").cast("double") / col("n_total").cast("double"))
  }
}
