package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic API's Column ↔ Expression converters
  * (`classic.ExpressionUtils`, private[sql] since Spark 4 moved
  * Column onto ColumnNode). Needed for expressions that cannot round
  * the SQL-function registry — graft's `NearestCells` carries a
  * Broadcast handle, which has no literal form. Standard extension
  * pattern: one tiny object in the sql package, nothing else of
  * Spark's internals re-exported.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
