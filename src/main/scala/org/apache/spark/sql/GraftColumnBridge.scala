package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column <-> Expression converters so
  * graft's custom Catalyst expressions (graft.expressions) can be exposed as
  * ordinary Columns. This is the only place the engine reaches into Spark
  * internals; everything else is public DataFrame API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
