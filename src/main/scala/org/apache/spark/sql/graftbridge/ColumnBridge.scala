package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode and left the Expression converters
  * `private[sql]` (classic.ExpressionUtils). This bridge — the standard
  * extension-library pattern: one object in a subpackage of
  * org.apache.spark.sql — re-exposes exactly the two conversions a custom
  * Catalyst expression needs to surface through the Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
