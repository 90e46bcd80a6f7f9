package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge over the `private[sql]` Column↔Expression converters (Spark 4
  * wraps Column around ColumnNode; classic mode provides the converters
  * but hides them). Standard extension-library pattern.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
