package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Batch–stream equivalence (SURVEY.md §5.2 item 5): run the streaming
  * transforms over the driver's events table fed as a ts-ordered file
  * stream; final results must equal the same transform applied in batch.
  */
class StreamsSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("streamspec").toString

  private def runComplete(stream: DataFrame, name: String): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  private lazy val events = Tables.events(spark, sf0001)

  test("tumbling daily: streaming complete-mode result == batch") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir, chunks = 5)
    val streamed = runComplete(Streams.tumblingDaily(in), "t_tumbling")
    val batch = Streams.tumblingDaily(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("sliding 1h/15m: streaming == batch") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir, chunks = 4)
    val streamed = runComplete(Streams.sliding(in), "t_sliding")
    val batch = Streams.sliding(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows: streaming (no watermark, complete) == batch") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir, chunks = 4)
    val streamed = runComplete(Streams.sessions(in, watermark = None), "t_sessions")
    val batch = Streams.sessions(events, watermark = None)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows: append mode emits exactly the watermark-closed sessions") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir, chunks = 4)
    val q = Streams.sessions(in).writeStream.format("memory")
      .queryName("t_sessions_append").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_sessions_append")
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val expected = Streams.sessions(events, watermark = None)
      .filter(col("se") < lit(maxTs) - expr("INTERVAL 1 HOUR"))
    assert(streamed.exceptAll(expected).isEmpty,
      "append emitted a session batch does not have (or an unclosed one)")
    assert(expected.exceptAll(streamed).isEmpty,
      "append failed to emit a watermark-closed session")
  }

  test("stateful dedup keeps one row per event_id (append mode)") {
    val dir = tmp()
    // duplicate the stream: two copies of every event
    val doubled = events.unionAll(events)
    val in = Streams.chunkedFileStream(spark, doubled, dir, chunks = 4)
    val q = Streams.dedup(in).writeStream.format("memory")
      .queryName("t_dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_dedup")
    assert(streamed.count() == events.count())
    assert(streamed.select("event_id").distinct().count() == events.count())
  }

  test("parquet file sink: deduped stream lands exactly-once and re-reads equal to batch") {
    val dir = tmp(); val out = tmp() + "/table"; val ckpt = tmp() + "/ckpt"
    val doubled = events.unionAll(events)
    val in = Streams.chunkedFileStream(spark, doubled, dir, chunks = 4)
    val q = Streams.toParquetSink(Streams.dedup(in), out, ckpt)
    q.processAllAvailable(); q.stop()
    // the sink's transaction log is what makes restarts exactly-once and
    // concurrent readers see only committed files
    assert(new java.io.File(out, "_spark_metadata").exists(),
      "parquet sink did not write its _spark_metadata commit log")
    val landed = spark.read.parquet(out)
    assert(landed.count() == events.count())
    assert(landed.select("event_id").distinct().count() == events.count())
    assert(landed.exceptAll(events).isEmpty && events.exceptAll(landed).isEmpty)
  }

  test("stream-stream interval join == the same join in batch") {
    val dir1 = tmp(); val dir2 = tmp()
    val errors = events.filter(col("event_type") === "error")
    val purchases = events.filter(col("event_type") === "purchase")
    val se = Streams.chunkedFileStream(spark, errors, dir1, chunks = 3)
    val sp = Streams.chunkedFileStream(spark, purchases, dir2, chunks = 3)
    val q = Streams.errorPurchaseJoin(se, sp).writeStream.format("memory")
      .queryName("t_ssjoin").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_ssjoin")
    val batch = Streams.errorPurchaseJoin(errors, purchases)
    assert(batch.count() > 0, "fixture has no error-after-purchase pairs within 1h")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER interval join: matches == batch, nulls emitted after watermark") {
    val dir1 = tmp(); val dir2 = tmp()
    val errors = events.filter(col("event_type") === "error")
    val purchases = events.filter(col("event_type") === "purchase")
    val se = Streams.chunkedFileStream(spark, errors, dir1, chunks = 3)
    val sp = Streams.chunkedFileStream(spark, purchases, dir2, chunks = 3)
    val q = Streams.errorPurchaseJoinOuter(se, sp).writeStream.format("memory")
      .queryName("t_ssjoin_outer").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_ssjoin_outer")
    val batch = Streams.errorPurchaseJoinOuter(errors, purchases)
    // matched rows: identical to the batch left join's matched subset
    val sm = streamed.filter(col("p_id").isNotNull)
    val bm = batch.filter(col("p_id").isNotNull)
    assert(sm.exceptAll(bm).isEmpty && bm.exceptAll(sm).isEmpty)
    // null rows: everything streamed is a true batch null (no spurious
    // nulls for errors that DID match), and every batch null strictly
    // below the final watermark (max event time − 1h delay, with a 1 s
    // guard against the eviction boundary) must have been emitted
    val sn = streamed.filter(col("p_id").isNull)
    val bn = batch.filter(col("p_id").isNull)
    assert(bn.count() > 0, "fixture has no unmatched errors")
    assert(sn.exceptAll(bn).isEmpty)
    // the query's global watermark is the MIN across inputs of
    // (that input's max event time - delay) — the slower side gates it
    val wmTs = Seq(errors, purchases)
      .map(_.agg(max("ts")).head().getTimestamp(0)).minBy(_.getTime)
    val mustEmit = bn.filter(
      col("e_ts") < lit(wmTs) - expr("INTERVAL 1 HOUR") - expr("INTERVAL 1 SECOND"))
    assert(mustEmit.count() > 0, "watermark never passed any unmatched error")
    assert(mustEmit.exceptAll(sn).isEmpty,
      "null rows provably complete under the final watermark were not emitted")
  }

  test("streaming ingestion into Stash: final KV state == batch last-event-per-user") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir + "/src", chunks = 3)
    val q = Streams.streamIntoStash(in, dir + "/stash", dir + "/ckpt")
    q.processAllAvailable(); q.stop()
    val (stash, version) = graft.kv.Stash.openLatest(spark, dir + "/stash")
    assert(version >= 0, "no stash version was committed")
    val got = stash.scan().collect()
      .map(e => e.key -> (e.longs("event_id"), e.scalars("value"), e.strings("last_type")))
      .toMap
    // batch truth: last event per user by (ts, event_id)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expected = events.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("user_id").cast("string"), col("event_id").cast("long"),
        col("value").cast("double"), col("event_type"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(got == expected)
    // GC keeps at most the final version plus the one its batch read —
    // older versions must be gone (unbounded growth was ADVICE round 3)
    val versions = new java.io.File(dir + "/stash").listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName)
    assert(versions.length <= 2,
      s"stash version dirs not garbage-collected: ${versions.mkString(",")}")
  }

  test("Stash.open backfills fields missing from older stash parquet") {
    val dir = tmp()
    // simulate a stash written before the `longs` field existed
    val (k, v) = ("u1", 7.5)
    import spark.implicits._
    Seq((k, Map("value" -> v), Map("last_type" -> "view")))
      .toDF("key", "scalars", "strings")
      .write.mode("overwrite").parquet(dir + "/old")
    val e = graft.kv.Stash.open(spark, dir + "/old").get(k).get
    assert(e.scalars("value") == v && e.longs.isEmpty && e.tensors.isEmpty)
  }

  test("flatMapGroupsWithState running counts: final state == batch counts") {
    val dir = tmp()
    val in = Streams.chunkedFileStream(spark, events, dir, chunks = 4)
    val q = Streams.userEventCounts(in).writeStream.format("memory")
      .queryName("t_fmgws").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    // Update mode emits a row per user per batch; the LAST (max) value per
    // user must equal the batch per-user count.
    val finalCounts = spark.table("t_fmgws")
      .groupBy("user_id").agg(max("n").as("n"))
    val batchCounts = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalCounts.exceptAll(batchCounts).isEmpty &&
      batchCounts.exceptAll(finalCounts).isEmpty)
  }

  test("transformWithState type profile (RocksDB store): final state == batch profile") {
    val dir = tmp()
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // the v2 state API requires the RocksDB provider (also the 100 TB one)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = Streams.chunkedFileStream(spark, events, dir, chunks = 4)
      val q = Streams.userTypeProfile(in).writeStream.format("memory")
        .queryName("t_tws").outputMode("update").start()
      q.processAllAvailable(); q.stop()
      // Update mode emits each touched user's running profile per batch;
      // the final (max) values must equal the batch per-user profile.
      val finalProf = spark.table("t_tws").groupBy("user_id")
        .agg(max("n_types").as("n_types"), max("total").as("total"))
      val batchProf = events.groupBy("user_id").agg(
        countDistinct(col("event_type")).cast("int").as("n_types"),
        count(lit(1)).as("total"))
      assert(finalProf.exceptAll(batchProf).isEmpty &&
        batchProf.exceptAll(finalProf).isEmpty)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark drops late data in append mode") {
    val dir = tmp()
    // Reverse chunk order: write newest chunk first so older rows arrive
    // after the watermark has advanced past them.
    val ev = events.select("event_id", "ts", "user_id", "event_type", "value", "props")
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val old = ev.filter(col("ts") < lit(maxTs) - expr("INTERVAL 10 DAYS"))
    val recent = ev.filter(col("ts") >= lit(maxTs) - expr("INTERVAL 10 DAYS"))
    recent.write.mode("overwrite").parquet(dir + "/in")
    val in = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    val q = Streams.tumblingDaily(in).writeStream.format("memory")
      .queryName("t_late").outputMode("append").start()
    q.processAllAvailable()
    old.write.mode("append").parquet(dir + "/in") // late arrivals
    q.processAllAvailable(); q.stop()
    val streamedDays = spark.table("t_late").select("d").distinct().count()
    val batchDays = Streams.tumblingDaily(ev).select("d").distinct().count()
    // late (old) windows must have been dropped, and append mode only emits
    // windows older than the advanced watermark
    assert(streamedDays < batchDays)
  }
}
