package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column↔Expression converters —
  * the supported classic-API path for third-party Catalyst expressions to
  * expose a Column builder (Spark 4 hides Column internals behind
  * ColumnNode).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
