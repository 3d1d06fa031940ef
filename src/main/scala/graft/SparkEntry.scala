package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory is assembled from per-module `defs` sequences so the
  * Spark implementation and its DuckDB oracle live side by side.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    ops.Relational.defs ++ ops.TextOps.defs ++ ops.DedupOps.defs ++
      ops.VectorOps.defs ++ ops.SearchOps.defs ++ ops.GraphOps.defs ++
      ops.EvalOps.defs ++ ops.MediaOps.defs ++ ops.ScaleOps.defs ++
      ops.SampleOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j3_multihop")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
