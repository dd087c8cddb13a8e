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

  /** A DataFrame over an already-computed local result, built as a
    * [[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]]
    * directly from InternalRow values — the kernel finale's result frame
    * without `createDataFrame`'s per-row Catalyst converter lookup and
    * `asJava` round-trip. Callers pass catalyst-typed values (UTF8String
    * for strings, java.lang.Long/Integer boxes, null for SQL NULL) in
    * schema order; collect() on the result decodes through the normal
    * row encoder. Only sensible for the tiny driver-side finale frames
    * the columnar kernels emit (one row to a few hundred); anything
    * data-sized belongs in an RDD-backed frame.
    */
  def localResult(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[Array[Any]]): DataFrame = {
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val internal = rows.map(vals =>
      org.apache.spark.sql.catalyst.InternalRow.fromSeq(vals.toSeq))
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(attrs, internal))
  }

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
