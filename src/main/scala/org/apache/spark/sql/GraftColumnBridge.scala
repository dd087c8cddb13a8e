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

  /** Register a SQL function on a live session (the runtime counterpart of
    * `SparkSessionExtensions.injectFunction`, which only applies at session
    * build time). Reaches sessionState.functionRegistry, which is
    * private[sql] — hence living in this bridge.
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** The underlying RDD when `df`'s plan is a LogicalRDD leaf (i.e. a
    * `localCheckpoint`ed frame): iterative operators that checkpoint per
    * round use this to UNPERSIST the superseded round's blocks —
    * `Dataset.unpersist` only talks to the CacheManager and cannot free
    * checkpoint storage, which would otherwise accumulate one vocab-sized
    * persist per round. None for any other plan shape.
    */
  def leafRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
