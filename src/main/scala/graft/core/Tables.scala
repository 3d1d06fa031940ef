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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is physically TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; the session is built with
    * spark.sql.legacy.parquet.nanosAsLong=true (GraftSession) so the
    * column arrives as LONG nanos, converted here to a micro-precision
    * timestamp. Integer division (`div`), NOT `/`: epoch-nano values
    * (~1.7e18) exceed double's 2^53 exact range, so floating division
    * followed by a cast truncates to timestamps off by 1µs.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
