package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable surrogate-key generation (SURVEY S4; reference
  * create_dataset.py:8 `with_row_index`).
  */
object GraftKeys {

  /** Global 1-based row index in `order`-sort order WITHOUT the
    * single-partition sort a `row_number() OVER (ORDER BY …)` window
    * needs: `orderBy` range-partitions + sorts locally (Spark's
    * distributed total sort), then `zipWithIndex` runs one extra
    * lightweight count job to learn per-partition row counts and
    * assigns contiguous global offsets — no task ever holds more than
    * its own partition. Rows that tie on `order` across a partition
    * boundary get an arbitrary but total order, exactly like
    * row_number. This is the 100-TB path; `s4_row_index` pins the
    * semantics against the oracle with the window form.
    */
  def sortedRowIndex(df: DataFrame, order: Seq[Column],
      name: String = "rid"): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
