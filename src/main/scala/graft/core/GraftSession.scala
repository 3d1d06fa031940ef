package graft.core

import org.apache.spark.sql.SparkSession

/** Single place where every entrypoint (Verify / Bench / Smoke / tests)
  * builds its SparkSession, so session-level flags are set once at build
  * time instead of being mutated as side effects of loaders.
  *
  * Flags:
  *   - shuffle.partitions sized to the local core count (not the 200
  *     default) — at cluster scale this is AQE-advised instead;
  *   - session timezone UTC (reference normalizes all timestamps to
  *     UTC, build_graph.py:181-187);
  *   - legacy.parquet.nanosAsLong: the driver-generated events table is
  *     physically TIMESTAMP(NANOS), which Spark's reader otherwise
  *     rejects; reading nanos as LONG lets Tables.events convert
  *     explicitly (integer division) without corrupting precision.
  */
object GraftSession {
  def build(master: String, shufflePartitions: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // static conf; a temp dir keeps bucketed-table tests (managed
      // tables) out of the repo working tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def local(cpus: String): SparkSession = build(s"local[$cpus]", cpus)
}
