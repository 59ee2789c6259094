package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made these converters
  * `private[sql]` (Column is ColumnNode-backed in sql-api); extensions that
  * define native Catalyst expressions conventionally expose them via a
  * package-internal bridge. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
