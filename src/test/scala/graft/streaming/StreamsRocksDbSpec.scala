package graft.streaming

/** The whole batch≡stream suite re-run on the RocksDB state-store
  * provider (r16 verdict item 6): the default (HDFS-backed in-memory)
  * provider holds every key in executor heap, so the 100 TB state story
  * — watermarked joins, stateful dedup, session windows with
  * million-key state — is RocksDB's; only `transformWithState` was
  * exercised on it. Inheriting re-runs EVERY StreamsSpec test (same
  * assertions, same chunked file feeds) with the provider flipped for
  * the suite's duration; suites run sequentially in the forked test JVM
  * (build.sbt `Test / fork := true`), so the shared-session conf flip
  * cannot leak into a concurrently running suite.
  *
  * Memory-sink query names are reused across the two suites against the
  * same session: the second registration replaces the first's temp view
  * (each test reads its table immediately after its own
  * processAllAvailable, so replacement cannot race a reader).
  */
class StreamsRocksDbSpec extends StreamsSpec {
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private var prev: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }

  override def afterAll(): Unit = {
    try prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    } finally super.afterAll()
  }
}
