package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON source/sink utilities (SURVEY §2.1 S2/S3): the reference
  * reads multi-line JSON arrays (pl.read_json) and writes both
  * JSON-lines batches and whole-array files (concatenate_json.py).
  */
object IO {

  /** S2: multi-line JSON array read with a DECLARED schema — never
    * inferSchema (SURVEY §1.4: determinism and a fixed data contract).
    */
  def readJsonArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", value = true).schema(schema).json(path)

  /** JSON-lines read (one object per line, splittable — the format
    * large pipelines should use; multiLine arrays are not splittable).
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines read with an explicit malformed-record policy — the
    * ingest-hygiene contract a continuous pipeline needs stated, not
    * defaulted. `failFast = true` aborts the job on the first corrupt
    * line (the correctness-gated posture); otherwise corrupt lines
    * land whole in a `_corrupt_record` column with nulls elsewhere
    * (PERMISSIVE), so the caller can split good rows from a
    * quarantine stream in one pass instead of losing them silently
    * (DROPMALFORMED's failure mode — deliberately not offered).
    * Spark refuses corrupt-column-ONLY queries straight off raw
    * files; materialize (cache/checkpoint/write) before filtering on
    * `_corrupt_record` alone.
    */
  def readJsonLinesStrict(spark: SparkSession, path: String,
      schema: StructType, failFast: Boolean): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "the data schema must not predeclare _corrupt_record — the " +
        "quarantine column is appended here (re-reading a quarantine " +
        "dump is a plain readJsonLines of the full schema)")
    if (failFast)
      spark.read.option("mode", "FAILFAST").schema(schema).json(path)
    else
      spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema.add("_corrupt_record", "string"))
        .json(path)
  }

  /** S3 distributed sink: JSON-lines directory, one file per
    * partition — the scale-safe default.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** S3 array-file sink for SMALL results (reference write_json
    * emits a single JSON array). Guarded: collects to the driver, so
    * refuse anything larger than `maxRows`.
    */
  def writeJsonArrayFile(df: DataFrame, path: String, maxRows: Int = 100000): Unit = {
    // ONE evaluation: collect limit(maxRows + 1) — bounded even when
    // oversized — and fail on the sentinel extra row. A separate
    // count-probe pass would evaluate df twice, and a
    // non-deterministic frame could pass the probe yet blow past the
    // cap at collect time — the driver-OOM this guard exists to stop.
    val rows = df.limit(maxRows + 1).toJSON.collect()
    require(rows.length <= maxRows,
      s"writeJsonArrayFile is a driver-side sink for small results " +
        s"(> $maxRows rows); use writeJsonLines")
    Files.writeString(Paths.get(path),
      rows.mkString("[\n", ",\n", "\n]"))
  }
}
