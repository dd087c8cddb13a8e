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
    // Force bucket-aligned scans: the DisableUnnecessaryBucketedScan
    // planner rule reverts a bucketed table to SIZE-BASED file splits when
    // no operator in the plan declares a distribution/ordering requirement
    // — which is exactly the shape of the single-pass kernels (a bare
    // projection feeding an RDD pass; the planner cannot see that the
    // kernel exploits bucket alignment). Size-based splits pack several
    // bucket files into one partition and the kernels' layout guards fire
    // (caught live: a 31-partition scan over 32 buckets in the Verify
    // session — two sorted files concatenated mid-partition). The conf is
    // runtime-modifiable and session-scoped, set here so every session
    // that stages a layout reads it bucket-aligned.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Self-heal an ORPHANED location: a crashed/killed prior run can leave
    // the table directory on disk while the (per-process derby) catalog has
    // no entry — DROP IF EXISTS is then a no-op and saveAsTable fails with
    // LOCATION_ALREADY_EXISTS. These staging tables are engine-owned by
    // construction, so removing the stale directory is safe. Local
    // filesystems only; on a shared metastore+DFS deployment the catalog
    // entry survives the crash and the DROP above handles it.
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    if (wh.getScheme == null || wh.getScheme == "file") {
      val loc = java.nio.file.Paths.get(wh.getPath + "/" + table)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(loc)
        try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
    }
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

  /** Memoized [[stageEventsByUser]] for repeated kernel queries in one
    * session: the first call per (session, dir, buckets) pays the staging,
    * every later call returns the already-staged table — the amortization
    * the layout exists for, made concrete (the six `q92+` kernel entries
    * in SparkEntry share ONE staging this way). The table name carries a
    * dir digest + the bucket count so multi-SF sessions (the bench's
    * slope mode) never alias two datasets onto one table. Entries live
    * for the process (sessions here are process-lived by design — the
    * same contract as Tables.load's memoization).
    */
  def eventsByUserCached(spark: SparkSession, dir: String, buckets: Int = 32)
      : DataFrame = {
    // superseded-generation eviction (r16 advice): the old fingerprint's
    // cells can never be probed again; the staged TABLE is overwritten by
    // the fresh staging (same digest name), so only the map entry leaks
    evictStale(stagedEvents, spark, dir, eventsKey(spark, dir))
    val key = (spark, eventsKey(spark, dir), buckets)
    val frame = LazyCell.force(stagedEvents, key,
      stagedEvents.computeIfAbsent(key, _ => new LazyCell({
        val table = "g_ev_bkt_" +
          java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff) + s"_$buckets"
        stageEventsByUser(spark, dir, buckets, table)
      })))
    // Re-assert the two scan confs on EVERY call, not just at staging: the
    // cached frame re-plans at each action against the session's CURRENT
    // conf, and if anything reset autoBucketedScan after staging (RESET,
    // another library), the planner would revert to size-based splits that
    // can split one bucket file MID-USER across partitions — the one
    // violation the kernels' ascending-(user_id, ts) guard cannot see
    // (each fragment is still locally ascending). Cheap, idempotent.
    reassertScanConfs(spark)
    frame
  }

  /** Staleness-guarded memo keys ([[Fingerprint.key]]): `dir` plus a
    * fingerprint of the SOURCE table file(s) the staging reads. A dir
    * regenerated in place mid-session changes the fingerprint, so the
    * staged-layout probes go cold (the dispatcher falls back to the
    * declarative form — no stale bucketed table is ever served) and the
    * next explicit staging pays a fresh rewrite of the same table name
    * (r15 verdict item 3). The listing is metadata-only, sub-ms/probe.
    */
  private def eventsKey(spark: SparkSession, dir: String): String =
    Fingerprint.key(spark, dir, "events.parquet")
  private def ordersKey(spark: SparkSession, dir: String): String =
    Fingerprint.key(spark, dir, "orders.parquet")
  private def factsKey(spark: SparkSession, dir: String): String =
    Fingerprint.key(spark, dir, "lineitem.parquet", "orders.parquet")

  private val stagedEvents =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), LazyCell[DataFrame]]()

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

  /** Memoized [[stageOrdersByCustkey]] — the q5-family analog of
    * [[eventsByUserCached]]: the first call per (session, dir, buckets)
    * pays the staging, every later call reuses the table (the `q99`
    * driver entry measures this post-staging steady state). Same digest
    * naming so multi-SF sessions never alias datasets.
    */
  def ordersByCustkeyCached(spark: SparkSession, dir: String, buckets: Int = 32)
      : DataFrame = {
    evictStale(stagedOrders, spark, dir, ordersKey(spark, dir))
    val key = (spark, ordersKey(spark, dir), buckets)
    val frame = LazyCell.force(stagedOrders, key,
      stagedOrders.computeIfAbsent(key, _ => new LazyCell({
        val table = "g_ord_bkt_" +
          java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff) + s"_$buckets"
        stageOrdersByCustkey(spark, dir, buckets, table)
      })))
    reassertScanConfs(spark)
    frame
  }

  /** Memoized [[stageFactsByOrderkey]] — both fact tables staged once per
    * (session, dir, buckets); the `q98` driver entry runs q2's fact join
    * over them as a zero-exchange co-located SortMergeJoin.
    */
  def factsByOrderkeyCached(spark: SparkSession, dir: String, buckets: Int = 32)
      : (DataFrame, DataFrame) = {
    evictStale(stagedFacts, spark, dir, factsKey(spark, dir))
    val key = (spark, factsKey(spark, dir), buckets)
    val frames = LazyCell.force(stagedFacts, key,
      stagedFacts.computeIfAbsent(key, _ => new LazyCell({
        val digest = java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
        stageFactsByOrderkey(spark, dir, buckets,
          lineitemTable = s"g_li_bkt_${digest}_$buckets",
          ordersTable = s"g_o_bkt_${digest}_$buckets")
      })))
    reassertScanConfs(spark)
    frames
  }

  /** The two scan confs every staged layout depends on, re-asserted on
    * each cached access (see [[eventsByUserCached]] for why a RESET
    * between staging and use would otherwise silently change the read).
    */
  private def reassertScanConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
  }

  private val stagedOrders =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), LazyCell[DataFrame]]()
  private val stagedFacts =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), LazyCell[(DataFrame, DataFrame)]]()

  /** Evict memo entries for SUPERSEDED source generations of `dir` (any
    * bucket count): their fingerprinted keys can never be probed again
    * ([[Fingerprint]] cannot recur), so without this each in-place
    * regeneration strands a staged-frame cell for the process lifetime
    * (r16 advice). The warehouse table itself is reclaimed by the next
    * staging's overwrite of the same digest-derived name.
    */
  private def evictStale[V](
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), LazyCell[V]],
      spark: SparkSession, dir: String, currentKey: String): Unit =
    Memo.evictSuperseded(cache,
      (k: (SparkSession, String, Int)) =>
        (k._1 eq spark) && k._2 != currentKey && k._2.startsWith(s"$dir@"))

  /** Test probe (r17): staged-events memo entries for `dir` across all
    * generations/bucket counts — eviction keeps it at 1 (StalenessSpec).
    */
  private[graft] def stagedEventsEntriesFor(spark: SparkSession, dir: String): Int = {
    import scala.jdk.CollectionConverters._
    stagedEvents.keySet.asScala.count(k =>
      (k._1 eq spark) && k._2.startsWith(s"$dir@"))
  }

  // NOTE (r13): memoizing a full QUERY frame (not just its scans) was
  // tried for q98/q99 and reverted — re-collecting one Dataset object
  // lets AQE reuse its materialized shuffle stages, so repeated "runs"
  // replay only the final stage (0.04 s readings for a 0.6 s join).
  // Scans (Tables.load) and staging (the caches above) stay memoized;
  // query frames must be rebuilt per call so every timed run recomputes.

  /** Cache probes for [[graft.Exec]]'s layout-form validity bounds: the
    * dispatcher runs a layout kernel only when this session has ALREADY
    * paid the staging (it never stages implicitly). The probe matches ANY
    * bucket count staged for the (session, dir) pair — the kernels'
    * correctness needs the clustering + within-bucket order, not a
    * specific bucket count, and a 64-bucket staging that left the
    * dispatcher on the declarative form would silently waste the staging
    * cost (r13 advice). The *Cached accessors default-resolve the count,
    * so probe and use agree: [[bucketsStagedFor]] feeds the dispatcher the
    * count that is actually cached.
    */
  def isEventsLayoutStaged(spark: SparkSession, dir: String): Boolean =
    bucketsStagedFor(stagedEvents, spark, eventsKey(spark, dir)).nonEmpty
  def isOrdersLayoutStaged(spark: SparkSession, dir: String): Boolean =
    bucketsStagedFor(stagedOrders, spark, ordersKey(spark, dir)).nonEmpty
  def isFactsLayoutStaged(spark: SparkSession, dir: String): Boolean =
    bucketsStagedFor(stagedFacts, spark, factsKey(spark, dir)).nonEmpty

  /** The bucket counts already staged for (session, dir) in `cache` —
    * smallest first, so a dispatcher picking `.headOption` is
    * deterministic when several counts were staged.
    */
  private def bucketsStagedFor[V](
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), LazyCell[V]],
      spark: SparkSession, key: String): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    // only COMPLETED stagings count: a thrown staging leaves its cell in
    // the map (evicted on force-failure, but a probe can race that), and
    // counting it would route dispatch onto a table never built
    cache.entrySet.asScala.collect {
      case e if {
        val (s, d, _) = e.getKey; (s eq spark) && d == key && e.getValue.done
      } => e.getKey._3
    }.toSeq.sorted
  }

  /** The staged events table for (session, dir) at WHICHEVER bucket count
    * the session staged (smallest when several) — the dispatcher-side
    * accessor that can never disagree with [[isEventsLayoutStaged]].
    * Throws when nothing is staged: callers gate on the probe first.
    */
  def eventsByUserStaged(spark: SparkSession, dir: String): DataFrame =
    eventsByUserCached(spark, dir,
      bucketsStagedFor(stagedEvents, spark, eventsKey(spark, dir)).headOption.getOrElse(
        throw new IllegalStateException(s"events layout not staged for $dir")))
  def ordersByCustkeyStaged(spark: SparkSession, dir: String): DataFrame =
    ordersByCustkeyCached(spark, dir,
      bucketsStagedFor(stagedOrders, spark, ordersKey(spark, dir)).headOption.getOrElse(
        throw new IllegalStateException(s"orders layout not staged for $dir")))
  def factsByOrderkeyStaged(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    factsByOrderkeyCached(spark, dir,
      bucketsStagedFor(stagedFacts, spark, factsKey(spark, dir)).headOption.getOrElse(
        throw new IllegalStateException(s"fact layout not staged for $dir")))

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
