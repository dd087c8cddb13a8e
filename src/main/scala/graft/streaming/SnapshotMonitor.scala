package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus-revision monitoring — the streaming form of q91's
  * snapshot diff. Each arriving micro-batch is a full corpus REVISION
  * (doc_id, source, text); the monitor diffs it against the latest
  * committed revision and appends the per-source
  * removed/added/changed/unchanged census to a history table, so a
  * pipeline sees "what did this re-crawl/re-ingest change" the moment the
  * revision lands — scraper breakage (mass removals), template churn
  * (mass changes) and source drop-out all surface as census spikes before
  * any downstream metric moves.
  *
  * Why this shape at 100 TB: only md5 DIGESTS are persisted per revision
  * (16 bytes + key per document — q14/q91's exchange argument), so the
  * diff join ships digests, never text, and the store grows by
  * O(docs · 16 B) per revision, not O(corpus chars). The diff is one
  * full-outer equi-join on doc_id against ONE prior revision (revisions
  * supersede — never a union of history); on a real deployment the digest
  * store is bucketed by doc_id and the join is exchange-free
  * (BucketedJoinSpec's q91 case proves that plan).
  *
  * Exactly-once: [[IncrementalNearDup]]'s discipline verbatim — every
  * write overwrites the batch's OWN `batch=<id>` subdir, the previous
  * revision is the HIGHEST `_SUCCESS`-committed id strictly below the
  * current batch, so a retried batch recomputes against the same
  * predecessor and reproduces its output byte-for-byte.
  */
object SnapshotMonitor {

  /** Start the monitor: each micro-batch of `snapshots` must be one full
    * (doc_id, source, text) corpus revision.
    */
  def start(snapshots: DataFrame, stateRoot: String, checkpoint: String,
      compactEvery: Int = 0, compactBuckets: Int = 32): StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingest(batch.sparkSession, batch.toDF(), stateRoot, batchId)
        // automatic store-maintenance policy (r14 verdict item 5): runs
        // inside the foreachBatch boundary, where batches are serialized
        // and this batch's writes are fully committed — the same free
        // quiesce argument as IncrementalNearDup.start's policy hook
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compact(batch.sparkSession, stateRoot, compactBuckets): Unit
      }
      .start()

  private def committedBatches(spark: SparkSession, path: String,
      ltBatch: Long): Seq[(Long, String)] =
    BatchStore.committedBatches(spark, path, ltBatch)

  /** One revision: commit this revision's digests under `digests/batch=<id>`
    * FIRST, then diff against the latest committed predecessor (first
    * revision diffs against empty — everything lands as added) and append
    * the census under `diffs/batch=<id>`. Also the backfill entry point.
    *
    * Commit order matters: digests before diffs means a committed diff for
    * batch B implies B's digest revision is also committed, so a crash
    * between the two writes can only lose B's CENSUS row — B+1 still diffs
    * against B's digests, never silently against B-1 (ADVICE r10). The
    * predecessor lookup uses `ltBatch = batchId`, which excludes B's own
    * just-committed digests, so a retry of B recomputes against the same
    * predecessor and stays idempotent.
    */
  def ingest(spark: SparkSession, snapshot: DataFrame,
      stateRoot: String, batchId: Long): Unit = {
    // Write no-op for a crash-retry of a revision whose diff the
    // compacted base already consumed (digests/batch=<id> was committed
    // before that compaction could run, so nothing is missing) — same
    // contract as [[IncrementalNearDup.ingest]]'s guard (r15 review).
    if (BatchStore.baseThrough(spark, s"$stateRoot/diffs") >= batchId) return
    val cur = snapshot
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .localCheckpoint()
    val prev = committedBatches(spark, s"$stateRoot/digests", ltBatch = batchId)
      .lastOption match {
        case Some((_, dir)) => spark.read.parquet(dir)
          .select(col("doc_id"), col("source"), col("h"))
        case None => cur.limit(0)
      }
    cur.write.mode("overwrite").parquet(s"$stateRoot/digests/batch=$batchId")
    graft.queries.Pipeline.snapshotDiffDigests(prev, cur)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$stateRoot/diffs/batch=$batchId")
  }

  /** The accumulated census history: one row per (revision, source),
    * ordered by (batch_id, source). Empty before the first commit.
    */
  def history(spark: SparkSession, stateRoot: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("n_removed", LongType),
      StructField("n_added", LongType), StructField("n_changed", LongType),
      StructField("n_unchanged", LongType), StructField("batch_id", LongType)))
    // visibleDirs, not committedBatches: after [[compact]] the consumed
    // diff batch dirs are replaced by one bucketed base, and the history
    // is the base plus any deltas committed above it
    val dirs = BatchStore.committedBatchDirs(spark, s"$stateRoot/diffs", Long.MaxValue)
    if (dirs.nonEmpty)
      spark.read.schema(schema).parquet(dirs: _*).orderBy("batch_id", "source")
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Store maintenance — two different disciplines because the two stores
    * have different supersession semantics:
    *
    *  - `diffs` is an APPEND-ONLY census history: standard delta-store
    *    compaction ([[BatchStore.compactStore]]) merges the accumulated
    *    `batch=<id>` dirs into one bucketed base (rows are unique per
    *    (batch_id, source), so compactStore's `distinct` is a no-op).
    *  - `digests` REVISIONS SUPERSEDE — a diff only ever reads the latest
    *    committed predecessor, never a union — so compaction here is GC,
    *    not merge: drop every committed revision older than the newest
    *    TWO. The newest is the next diff's predecessor; the second-newest
    *    must survive because a crash between batch B's store commit and
    *    its checkpoint commit retries B, and the retry re-diffs against
    *    B's own predecessor (`ltBatch = batchId` excludes B's digests).
    *    Markerless dirs below the kept pair are crashed-write junk and
    *    are swept with them.
    *
    * Quiesce contract is [[BatchStore.compactStore]]'s; the [[start]]
    * policy hook satisfies it by running inside the batch boundary.
    * Returns the highest diff batch id compacted, or -1 when empty.
    */
  def compact(spark: SparkSession, stateRoot: String, buckets: Int): Long = {
    val t = BatchStore.compactStore(spark, s"$stateRoot/diffs", buckets, "batch_id")
    val committed = committedBatches(spark, s"$stateRoot/digests", Long.MaxValue)
    if (committed.size > 2) {
      val keepFrom = committed(committed.size - 2)._1
      val p = new org.apache.hadoop.fs.Path(s"$stateRoot/digests")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.filter(_.isDirectory).foreach { d =>
        val name = d.getPath.getName
        if (name.matches("batch=\\d+") && name.drop(6).toLong < keepFrom)
          fs.delete(d.getPath, true)
      }
    }
    t
  }
}
