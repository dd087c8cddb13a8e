package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Output row of [[Streams.userEventCounts]]. */
case class UserCount(user_id: Long, n: Long)

/** Output row of [[Streams.userTypeProfile]]. */
case class UserTypeProfile(user_id: Long, n_types: Int, total: Long)

/** Structured Streaming surface (SURVEY.md §2.2 rows 39–43): the SAME
  * operators the batch queries use (`window`, `session_window`), lifted to
  * streams with watermarks. Each transform takes any events-shaped frame
  * (batch or streaming) — the test suite proves final streaming output
  * equals the batch result on the driver's events table.
  *
  * Scale notes: stateful ops key their state by (window x event_type) or
  * (session x user) — state size is bounded by the watermark horizon, not
  * the stream length; shuffle is on the group keys exactly as in batch.
  */
object Streams {

  /** Optionally apply an event-time watermark (streaming state bound). */
  private def wm(events: DataFrame, watermark: Option[String]): DataFrame =
    watermark.fold(events)(events.withWatermark("ts", _))

  /** Q11s: 1-day tumbling window counts/sums with a 1-hour watermark.
    * The sum is the same fixed-point dsum as batch q11 — order-independent
    * and exact, so streaming-vs-batch equality is bit-identical, not a
    * rounded-double coincidence.
    */
  def tumblingDaily(events: DataFrame, watermark: Option[String] = Some("1 hour")): DataFrame =
    wm(events, watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("c"), graft.queries.Relational.dsum(col("value"), 2).as("s"))
      .select(to_date(col("window.start")).as("d"), col("event_type"), col("c"), col("s"))

  /** Sliding window variant: 1-hour windows every 15 minutes. */
  def sliding(events: DataFrame, watermark: Option[String] = Some("1 hour")): DataFrame =
    wm(events, watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("ws"), col("event_type"), col("c"))

  /** Q12s: session windows with a 30-minute inactivity gap.
    * NOTE: unlike plain windowed aggregation, the session operator EVICTS
    * finalized sessions from state once the watermark passes them — even in
    * complete output mode. Equivalence with batch therefore holds either
    * with no watermark (complete mode) or in append mode restricted to
    * sessions whose end precedes the final watermark (both tested).
    */
  def sessions(events: DataFrame, watermark: Option[String] = Some("1 hour")): DataFrame =
    wm(events, watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n"))

  /** Stream-stream inner join with an event-time interval: each 'error'
    * event matched to 'purchase' events by the same user within the hour
    * BEFORE the error. Both sides carry watermarks and the join predicate
    * bounds event-time distance, so the state store can evict rows once the
    * watermark passes the interval — the ONLY configuration under which a
    * stream-stream join has bounded state. State is keyed/shuffled by
    * user_id exactly like the batch join. Works identically on batch frames
    * (the spec proves streaming output == the batch join).
    */
  def errorPurchaseJoin(errors: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val e = errors.withWatermark("ts", watermark)
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    e.join(p,
      col("e_user") === col("p_user") &&
        col("p_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") < col("e_ts"))
      .select(col("e_id"), col("p_id"), col("e_user").as("user_id"))
  }

  /** LEFT OUTER stream-stream interval join: like [[errorPurchaseJoin]],
    * but errors with NO purchase in the prior hour also emit — with a null
    * p_id — once the watermark passes the error's event time (the interval
    * bound p_ts < e_ts means no later-arriving purchase can ever match, so
    * the row is provably complete and its state evictable). This deferred
    * null emission is the semantic difference from the batch left join,
    * which sees the whole input at once: rows still inside the final
    * watermark horizon when the stream stops remain unemitted. Same keyed
    * state, same eviction bound, same 100 TB story as the inner form.
    */
  def errorPurchaseJoinOuter(errors: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val e = errors.withWatermark("ts", watermark)
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    e.join(p,
      col("e_user") === col("p_user") &&
        col("p_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") < col("e_ts"),
      "left_outer")
      .select(col("e_id"), col("p_id"), col("e_user").as("user_id"), col("e_ts"))
  }

  /** Q14s: stateful dedup by key within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via flatMapGroupsWithState: a running per-user
    * event counter that emits the updated total on every micro-batch
    * (Update mode). The state (one long per user) lives in the state store,
    * partitioned by user — the template for bespoke stateful logic that
    * session_window/window cannot express. Works identically on a batch
    * frame (state starts empty, one group call per user).
    */
  def userEventCounts(events: DataFrame): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator(UserCount(uid, n))
        })
  }

  /** Per-user event-type profile via transformWithState — Spark 4's
    * arbitrary-state API v2 next to [[userEventCounts]]'s v1
    * (flatMapGroupsWithState): typed composite state (a MapState cell per
    * event type) instead of one monolithic value, lazily iterated from the
    * store, with per-state TTL available (TTLConfig.NONE here — the counts
    * are cumulative by design). Emits the updated (n_types, total) profile
    * for each user touched by the micro-batch (Update mode).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`),
    * which is also the provider a 100 TB deployment runs: state lives
    * off-heap/on-disk with changelog checkpointing, so per-key state size
    * is bounded by RocksDB, not executor heap.
    */
  def userTypeProfile(events: DataFrame): Dataset[UserTypeProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new UserTypeProfileProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  /** Land a streaming result in a parquet FILE sink — the continuous-
    * ingestion path that materializes cleaned/deduped data as a table.
    * Exactly-once at the file level: the sink's `_spark_metadata`
    * transaction log records which files each committed batch wrote, a
    * restarted query re-runs an uncommitted batch without double-landing
    * it, and readers (batch or streaming) only see logged files — never a
    * partially-written one. Append mode: for finalized rows only
    * (watermark-closed aggregates, or stateless/dedup streams that emit
    * rows once).
    */
  def toParquetSink(result: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    result.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  /** Continuous ingestion into the KV layer — the biggie-flavored streaming
    * use case: each micro-batch upserts its latest event per user into a
    * [[graft.kv.Stash]] (key = user_id; scalar fields value/event_id,
    * string field last_type). foreachBatch is the sink: within a batch the
    * per-key winner is picked deterministically (max ts, then event_id),
    * then one distributed keyed upsert merges it over the previous stash
    * version, and the result commits to `root/v<batchId>` — a retried batch
    * rewrites its own version dir, so the pipeline is effectively-once
    * without a transactional format. Versions older than the one this batch
    * read are garbage-collected after the commit (they can never be read
    * again — see [[graft.kv.Stash.gcVersions]]), so disk holds at most two
    * state copies, not one per batch.
    *
    * Cost model: each batch REWRITES the full accumulated state (one
    * shuffle on key + O(total state) write). That is the right trade at
    * moderate key cardinality (last-value-per-user fits comfortably); at
    * very large key counts, swap the sink for a partitioned upsert
    * (bucketed state + rewrite-touched-buckets-only) with the same
    * versioned-commit discipline.
    */
  def streamIntoStash(events: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val ents = batch
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .select(col("user_id").cast("string").as("k"),
            col("value").cast("double").as("v"),
            // event_id stays a LONG end to end: ids above 2^53 would
            // silently lose precision through a double (ADVICE round 3)
            col("event_id").cast("long").as("eid"),
            col("event_type").as("t"))
          .as[(String, Double, Long, String)]
          .map { case (k, v, eid, t) =>
            graft.kv.Entity(k,
              scalars = Map("value" -> v),
              strings = Map("last_type" -> t),
              longs = Map("event_id" -> eid))
          }
        // beforeVersion = batchId: a RETRIED batch (crash after commit but
        // before the checkpoint recorded the offset) must re-read what the
        // original attempt read — never its own already-committed output,
        // which it is about to overwrite
        val (cur, readVer) = graft.kv.Stash.openLatest(spark, root, beforeVersion = batchId)
        cur.addAll(ents).save(s"$root/v$batchId")
        // versions below the one just read are unreachable from now on
        // (openLatest picks the max committed version; a retry of THIS
        // batch re-reads readVer, which is kept)
        graft.kv.Stash.gcVersions(spark, root, keepFrom = readVer)
        ()
      }
      .start()

  /** Continuous ingestion into the PACKED training corpus (r19): each
    * micro-batch of documents packs as its own committed epoch under the
    * [[graft.queries.Pipeline.appendPackedEpochs]] layout — the streaming
    * face of incremental epoch packing, completing the family the way
    * [[streamIntoStash]] completes the KV layer. foreachBatch is the
    * sink; [[graft.queries.Pipeline.appendPackedDelta]] carries both the
    * delta discovery (docs not yet in a committed epoch) and the replay
    * guard: a RETRIED batch finds its docs already packed and commits
    * nothing, so the corpus is exactly-once per doc without a
    * transactional format. Batches with nothing new commit no epoch.
    *
    * Scale shape per batch: one id-grain anti-join against the layout's
    * ids sidecars + the q151 fold over only the batch — committed epochs
    * are never read or rewritten, so steady-state cost is O(batch), not
    * O(corpus).
    */
  def streamIntoPackedEpochs(docs: DataFrame, root: String, checkpoint: String,
      shards: Int = 8, seqLen: Long = 512L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.queries.Pipeline.appendPackedDelta(batch, root, shards, seqLen)
        ()
      }
      .start()

  /** Feed a batch events frame as a file stream: write ts-ordered chunks to
    * a temp dir, readStream over it (schema from the batch frame). The ts
    * ordering makes append-mode final output deterministic (SURVEY §2.3).
    */
  def chunkedFileStream(
      spark: SparkSession,
      events: DataFrame,
      dir: String,
      chunks: Int,
      filesPerTrigger: Int = 1): DataFrame = {
    // The file source processes files in MODIFICATION-TIME order, so chunks
    // must be written sequentially (a parallel range-partitioned write
    // commits files in task-finish order — a late chunk landing first would
    // advance the watermark and get earlier chunks dropped as late data).
    // The ntile window is single-partition; fine for a test harness.
    import org.apache.spark.sql.expressions.Window
    val chunked = events
      .withColumn("_c", ntile(chunks).over(Window.orderBy("ts")))
      .cache()
    (1 to chunks).foreach { i =>
      chunked.filter(col("_c") === i).drop("_c").coalesce(1)
        .write.mode(if (i == 1) "overwrite" else "append").parquet(dir + "/in")
    }
    chunked.unpersist()
    spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(dir + "/in")
  }
}

/** See [[Streams.userTypeProfile]]: one MapState cell per (user, type);
  * the per-batch emit folds the map — state grows with the user's distinct
  * types (bounded by the type vocabulary), never with the event count.
  */
class UserTypeProfileProcessor
    extends StatefulProcessor[Long, (Long, String), UserTypeProfile] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[UserTypeProfile] = {
    rows.foreach { case (_, t) =>
      val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
      counts.updateValue(t, cur + 1L)
    }
    var total = 0L
    var n = 0
    counts.iterator().foreach { kv => total += kv._2; n += 1 }
    Iterator(UserTypeProfile(key, n, total))
  }
}
