package graft

import graft.queries.Relational

/** The spark.sql surface over registered views must agree with the
  * DataFrame DSL implementations — users of the engine can mix both.
  * (The oracle contract itself is DSL-defined; this pins the SQL path.)
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views == DataFrame DSL (q1, q6)") {
    Tables.registerViews(spark, sf0001)
    val sqlQ1 = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)) AS DOUBLE)/10000.0, 2) AS sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
    val dslQ1 = Relational.q1(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty")
    assert(sqlQ1.exceptAll(dslQ1).isEmpty && dslQ1.exceptAll(sqlQ1).isEmpty)

    val sqlQ6 = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin)
    val dslQ6 = Relational.q6(spark, sf0001)
    assert(sqlQ6.collect().toSeq == dslQ6.collect().toSeq)
  }

  test("events view carries the microsecond timestamp (nanos handled)") {
    Tables.registerViews(spark, sf0001)
    val r = spark.sql(
      "SELECT count(DISTINCT user_id) AS du, max(ts) AS mx FROM events").head
    assert(r.getLong(0) > 0)
    assert(r.get(1).isInstanceOf[java.sql.Timestamp])
  }
}
