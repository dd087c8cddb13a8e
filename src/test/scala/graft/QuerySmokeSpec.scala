package graft

/** t1-style smoke: every declared query executes at sf0.001 and returns the
  * expected shape (rows > 0, no all-null columns where values are expected).
  */
class QuerySmokeSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name executes and returns rows at sf0.001") {
      val df = fn(spark, sf0001)
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("known invariants at sf0.001") {
    import org.apache.spark.sql.functions._
    // q1: 3 flags x 2 statuses
    assert(SparkEntry.queries("q1_pricing_agg")(spark, sf0001).count() == 6)
    // q5: rn bounded by 3
    val q5 = SparkEntry.queries("q5_rank_window")(spark, sf0001)
    assert(q5.agg(max("rn")).head.getLong(0) <= 3)
    // q16: exactly 10 query vecs x 5 neighbors
    assert(SparkEntry.queries("q16_cosine_topk")(spark, sf0001).count() == 50)
    // q19: three set-op rows
    assert(SparkEntry.queries("q19_set_ops")(spark, sf0001).count() == 3)
  }
}
