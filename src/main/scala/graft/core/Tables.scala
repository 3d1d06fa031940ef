package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's source layer (S1 parquet scan,
  * reference create_dataset.py:7) but Spark-native: `spark.read.parquet`
  * gives Catalyst pushdown/pruning for free — filters and column
  * selection applied downstream reach the parquet reader.
  */
object Tables {
  /** Parquet footer schemas, memoized per path (r19). A bare
    * `spark.read.parquet(path)` runs a SCHEMA-INFERENCE JOB (read the
    * footers) at plan-build time — one extra ~50 ms job per table per
    * query, which across a 278-query bench is pure fixed overhead
    * (opt guide §6: this is the work a table catalog's metadata
    * normally absorbs). The schema of a given parquet path is a fact
    * about the file, so it is read once per JVM and passed explicitly
    * thereafter; only table METADATA is memoized — every query still
    * computes its result from the parquet data in full.
    *
    * INVARIANT (r20, advice): the memo assumes bench data is IMMUTABLE
    * for the JVM's lifetime — rewriting a path with a DIFFERENT schema
    * mid-process would serve the stale StructType, and the explicit
    * read schema also disables footer merging for multi-file dirs with
    * evolving schemas. Both hold here by construction (the driver
    * generates testdata once, single-file tables, schemas fixed per
    * generation); a long-lived library host mutating table schemas
    * in-place should key this cache on (path, mtime) instead.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalized to a session-zone TIMESTAMP regardless of the
    * generator's physical type, which has varied across driver testdata
    * generations:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it natively; the
    *     session sets spark.sql.legacy.parquet.nanosAsLong=true
    *     (GraftSession) so it arrives as LONG nanos — converted here
    *     with integer division (`div`, NOT `/`: epoch-nano values
    *     ~1.7e18 exceed double's 2^53 exact range, so floating division
    *     then cast truncates timestamps off by 1µs).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ — cast to TIMESTAMP, value-identical under the
    *     session's pinned UTC zone, keeping every downstream consumer
    *     (windows, session_window, unix_timestamp) on one type.
    *   - TIMESTAMP(MICROS, adjusted): already TimestampType; untouched.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Loud guard before the ÷1000: the LongType branch is specifically
        // the nanosAsLong encoding (~1.8e18 for 2020s dates). If a future
        // testdata generation ships INT64 micros (~1.8e15) this division
        // would silently corrupt every timestamp 1000×; assert magnitude
        // on one row instead of guessing.
        val sample = df.select(col("ts")).where(col("ts").isNotNull).head(1)
        sample.headOption.map(_.getLong(0)).foreach { v =>
          if (v < 1e17.toLong)
            throw new IllegalStateException(
              s"events.ts is LongType but magnitude $v is not epoch-nanos " +
                "(~1e18 expected); refusing the nanos->micros division. " +
                "Inspect the generator's physical ts type.")
        }
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unexpected parquet-decoded type $other; " +
            "known generations are LONG nanos, TIMESTAMP_NTZ micros, and " +
            "adjusted TIMESTAMP micros. Extend Tables.events explicitly.")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Total order over every output column (same as DuckDB `ORDER BY ALL`).
    * Applied as the last step of every oracle-checked query so the result
    * byte-sequence is deterministic across engines: rows that tie on all
    * output columns are identical, so any permutation among ties hashes
    * the same.
    */
  def orderedByAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)
}
