package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: set
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every graft custom
  * expression becomes a SQL function in that session — the deployment path
  * for SQL-first users on a cluster, equivalent to calling
  * [[graft.functions.GraftSqlFunctions.register]] at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.GraftSqlFunctions.inject(ext)
}
