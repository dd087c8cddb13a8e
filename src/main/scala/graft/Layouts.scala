package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Pay-once physical layouts for repeated analytics — the deployment
  * story measured in tools/bench_bucketed_latest.json and documented in
  * docs/DEPLOY.md, packaged as one-call staging so a user gets the
  * layout the numbers were recorded on, not a hand-rolled variant that
  * silently misses a precondition.
  *
  * The recipe every method follows: repartition on the bucket column
  * FIRST so each bucket's rows land in exactly one task → ONE file per
  * bucket, which is the precondition for Spark's bucketed scan to report
  * its within-bucket sort order (`spark.sql.legacy.bucketedTableScan.
  * outputOrdering`, set here); then `bucketBy(...).sortBy(...)`. Queries
  * against the staged table plan with ZERO exchange on the bucket key
  * and ZERO sort where their order requirement is a prefix of the
  * layout's — the per-query shuffle+sort is pre-paid at write time and
  * amortizes across the query family (amortization counts are in the
  * bench artifact). At cluster scale the same code holds: bucketed
  * saveAsTable is Hive-layout-compatible, and the scan-side guarantees
  * are per-file, not per-executor.
  */
object Layouts {

  /** Generic staged layout: `df` bucketed by `bucketCol`, each bucket one
    * file, sorted within buckets by `sortCols` (which must start with
    * `bucketCol` for the scan to report the order).
    */
  def stageBucketedSorted(df: DataFrame, buckets: Int, bucketCol: String,
      sortCols: Seq[String], table: String): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(bucketCol))
      .write.bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite").saveAsTable(table)
  }

  /** The events-family layout (SURVEY §2.2 rows 20-22, 39-41 read paths):
    * bucketed by user_id, sorted by (user_id, ts, event_id) — the exact
    * clustering + order q12/q13/q21/q51/q70/q71 require, making the whole
    * family exchange- and sort-free, and the precondition of the
    * single-pass `Events.*FromSortedKernel` forms that drop the
    * WindowExec/hash-agg/as-of-join machinery itself (see the kernels'
    * scaladoc and the guard in Events.badLayout).
    */
  def stageEventsByUser(spark: SparkSession, dir: String, buckets: Int,
      table: String = "g_ev_bkt"): DataFrame = {
    stageBucketedSorted(Tables.events(spark, dir), buckets, "user_id",
      Seq("user_id", "ts", "event_id"), table)
    spark.table(table)
  }

  /** The per-customer top-k layout (q5's shape): orders bucketed by
    * o_custkey, pruned to the three columns the query family reads; the
    * heap aggregate plans as one exchange-free complete-mode stage.
    */
  def stageOrdersByCustkey(spark: SparkSession, dir: String, buckets: Int,
      table: String = "g_ord_bkt"): DataFrame = {
    stageBucketedSorted(
      Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
      buckets, "o_custkey", Seq("o_custkey"), table)
    spark.table(table)
  }

  /** The co-located fact-join layout (q2's shape at the scale where
    * nothing broadcasts): lineitem and orders each bucketed + sorted on
    * the orderkey, so the fact join runs as a zero-exchange co-located
    * SortMergeJoin.
    */
  def stageFactsByOrderkey(spark: SparkSession, dir: String, buckets: Int,
      lineitemTable: String = "g_li_bkt", ordersTable: String = "g_o_bkt")
      : (DataFrame, DataFrame) = {
    stageBucketedSorted(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
      buckets, "l_orderkey", Seq("l_orderkey"), lineitemTable)
    stageBucketedSorted(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
      buckets, "o_orderkey", Seq("o_orderkey"), ordersTable)
    (spark.table(lineitemTable), spark.table(ordersTable))
  }
}
