package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked operator query: the Spark implementation and the
  * equivalent DuckDB SQL side by side, so column aliases stay in sync
  * (the driver's compare hashes values after sorting columns by name).
  * `oracle = None` → driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
