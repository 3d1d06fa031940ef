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
    // guard BEFORE collecting: limit(maxRows + 1) bounds the probe, so
    // an oversized frame fails fast instead of OOMing the driver
    val probe = df.limit(maxRows + 1).count()
    require(probe <= maxRows,
      s"writeJsonArrayFile is a driver-side sink for small results " +
        s"(> $maxRows rows); use writeJsonLines")
    Files.writeString(Paths.get(path),
      df.toJSON.collect().mkString("[\n", ",\n", "\n]"))
  }
}
