package graft

import org.apache.spark.sql.SparkSession

/** Library entry point (SURVEY.md §7 step 1): a SparkSession configured
  * the way the engine's contract expects, so users don't rediscover the
  * three non-obvious settings by hitting their failure modes:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the events table is
  *    TIMESTAMP(NANOS) parquet, which Spark 4 otherwise refuses to read
  *    (`Tables.events` then truncates to microseconds).
  *  - UTC session timezone: every declared query result is rendered in
  *    UTC; a local-TZ session silently shifts date buckets.
  *  - shuffle partitions sized to cores, not the 200 default: at local
  *    test scale 200 partitions is pure task-scheduling overhead.
  *
  * On a real cluster, pass the same configs plus
  * `spark.sql.extensions=graft.GraftExtensions` to spark-submit; this
  * factory is the local / embedded equivalent. AQE (on by default in
  * Spark 4) is left on — skew joins and runtime coalescing are part of
  * the 100 TB story.
  */
object Session {

  /** Local session with the engine's contract configs. `withExtensions`
    * additionally registers every graft custom expression as a SQL
    * function (the [[GraftExtensions]] injection path).
    *
    * NOTE getOrCreate semantics: if a session already exists in the JVM
    * (spark-shell, notebook), runtime confs above are applied to it but
    * construction-time extensions CANNOT be — in that case call
    * `graft.functions.GraftSqlFunctions.register(spark)` instead, or start
    * the shell with `--conf spark.sql.extensions=graft.GraftExtensions`.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft",
      withExtensions: Boolean = true,
      maxPartitionBytes: Long = 1024L * 1024): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Typed-Aggregator queries (q5 top-k, q47 Misra-Gries, KMV) run under
      // ObjectHashAggregateExec, which abandons hash aggregation for a
      // SORT-based fallback after a mere 128 distinct groups per task by
      // default — re-introducing exactly the per-partition sort the
      // bounded-state aggregates exist to avoid. Every graft aggregate
      // buffer is O(k) small (3-row heap, k-minimum sketch, MG counters),
      // so 1M groups/task is ≤ ~a few hundred MB — raise the threshold so
      // hash mode holds at realistic group counts; past it the sort
      // fallback remains as the memory safety valve.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Scan-split sizing for the LOCAL test SFs (r17, measured): the
      // testdata files are 2-10 MB, so Spark's 128 MB default makes every
      // non-bucketed scan a SINGLE task and leaves cores idle in the scan
      // stage; 1 MB splits + a 128 KB open cost parallelize the fact scans
      // ~8-10-way (q1 -25%, q2 -18%, q3 -13%, q7 -14% at sf0.1) while the
      // open cost keeps KB-sized dims at one split. Results are unaffected
      // by construction: every aggregate here is fixed-point/integer and
      // partition-count independent (the determinism discipline), and
      // bucketed-table scans ignore this knob (one partition per bucket).
      // At PRODUCTION data sizes pass maxPartitionBytes = 128 MB (Spark's
      // default) or larger — the parameter exists (r17 advice) so a user
      // pointing this entry point at GB-scale files isn't stuck with
      // thousands of scan partitions per file; the default stays sized
      // for the 2-10 MB test SFs this factory is documented for.
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      // Pin the catalog to in-memory: with Hive jars on the classpath a
      // hive catalog boots an embedded Derby metastore in user.dir, and
      // Derby permits exactly ONE JVM — a second concurrent graft process
      // (driver gate + bench, or a lingering shell) then dies in
      // getOrCreate before running anything. The engine never uses
      // persistent catalog state (all views are temp), so in-memory is
      // both correct and removes the cross-process lock entirely.
      .config("spark.sql.catalogImplementation", "in-memory")
    val s = (if (withExtensions) b.withExtensions(new GraftExtensions) else b)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** [[local]] plus the ten testdata tables registered as temp views
    * (`Tables.registerViews`) — one call from nothing to `spark.sql`
    * over the corpus.
    */
  def localWithViews(dataDir: String,
      cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = local(cores)
    Tables.registerViews(s, dataDir)
    s
  }
}
