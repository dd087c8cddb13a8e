package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir` (e.g.
  * `/root/testdata/sf0.01`). At 100 TB these would be partitioned
  * directories; `spark.read.parquet` handles both transparently, and all
  * query code below depends only on schema, not layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, dir, table): `spark.read.parquet` pays driver-
    * side file listing + footer schema inference on EVERY call, and a
    * Dataset's analyzed plan / queryExecution is cached per OBJECT — so
    * handing back the same Dataset makes repeated query builds (bench runs,
    * interactive reuse) skip ~0.3–0.5 s of pure plan-construction overhead.
    * Safe because Datasets are immutable and the test tables are static;
    * sessions here are process-lived, so strong keys don't leak. Paths the
    * engine WRITES (Stash stores, stream sinks) never go through Tables.
    *
    * ALIASING CONTRACT: repeated loads return the IDENTICAL DataFrame
    * object, so its expression IDs are shared. Any query that self-joins a
    * table must alias each side (`load(...).as("l")` / `.as("r")`) or
    * derive fresh attributes (select-with-rename) before joining —
    * otherwise the join condition resolves trivially-true/ambiguous.
    * Every current self-join in the repo does this (q15/q36 rename, q59
    * windows); the contract is recorded here because fresh exprIds per
    * call used to mask the mistake.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL). We read it as a long (legacy conf) and
    * truncate to microseconds — Spark's native timestamp precision. The
    * DuckDB oracle SQL truncates identically via epoch_us() so both engines
    * compare the same microsecond values.
    *
    * NOTE the conf is session-wide and sticks after this call: any later
    * read of OTHER nanos-timestamped parquet in the same session will get
    * LongType instead of an error. Engine-owned sessions (Bench/Verify/
    * tests) set it at build time; this lazy set covers caller-provided
    * sessions. Scoping it per-read is unsafe because the conf is consulted
    * again at scan execution, not just at schema inference.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views (for spark.sql surface + tests).
    * events goes through its dedicated loader so the view carries the
    * microsecond-truncated timestamp, not the unreadable NANOS raw column.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
