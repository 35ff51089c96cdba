package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the blessed
  * in-package way back to Catalyst expressions for custom Expression
  * libraries like graft.functions).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
