package graft.streaming

import graft.expressions.TextVecExprs
import graft.queries.TextVec
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental near-duplicate detection — the streaming form of q15's
  * banded MinHash-LSH join, against a PERSISTED signature/band store.
  *
  * Why this shape at 100 TB: re-running corpus-wide LSH per arrival batch
  * is O(corpus) every batch. Here each batch pays O(batch) to signature
  * its own documents, one band-key equi-join against the store for
  * candidates (shuffle keyed on band keys — never a cross join), and an
  * exact-Jaccard verify on the few surviving pairs. State lives in
  * batch-partitioned parquet (`batch=<id>` subdirs), NOT executor memory,
  * so it survives restarts and is shared by any number of readers. On a
  * real deployment the band store would additionally be bucketed by band
  * key (pay-shuffle-once, cf. BucketedJoinSpec) so the per-batch join
  * reshuffles only the new batch's 8 rows/doc.
  *
  * Exactly-once: every write targets the batch's OWN `batch=<id>` subdir
  * with overwrite, and reads of the store exclude `batch >= batchId`
  * (partition-pruned) — a retried batch re-reads exactly what the
  * original attempt saw and overwrites only its own output (same
  * discipline as Stash.openLatest's beforeVersion bound).
  *
  * Dials (16 hashes / 8 bands / 6-of-16 prefilter / J >= 0.6) are q15's —
  * recall characteristics are identical, and the spec proves the
  * incremental pair set equals batch q15 on the full corpus.
  */
object IncrementalNearDup {

  /** Start the ingestion stream: `docs` must carry (doc_id, text).
    *
    * `compactEvery` > 0 turns on the automatic compaction policy (r14
    * verdict item 5): after every `compactEvery`-th batch commits, the
    * three stores are compacted from INSIDE the foreachBatch boundary.
    * That placement is what satisfies [[compact]]'s quiesce contract
    * without stopping the stream: foreachBatch serializes batches, so at
    * that point batch `batchId` is fully committed, nothing else writes,
    * the next batch reads with bound `batchId + 1 >` the base's
    * `through = batchId`, and a crash-retry of `batchId` itself lands on
    * [[BatchStore.visibleDirs]]'s spec-pinned `through == ltBatch` path.
    * 0 (the default) keeps compaction manual.
    */
  def start(docs: DataFrame, stateRoot: String, checkpoint: String,
      compactEvery: Int = 0, compactBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingest(batch.sparkSession, batch.toDF(), stateRoot, batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compact(batch.sparkSession, stateRoot, compactBuckets): Unit
      }
      .start()

  /** `batch=<id>` subdirs under `path` that carry the committer's
    * `_SUCCESS` marker, with id strictly below `ltBatch`. Reading ONLY
    * committed dirs (same discipline as Stash.openLatest) keeps truncated
    * parquet from a crashed write out of both schema inference and results,
    * and keeps an in-flight batch invisible to concurrent readers.
    */
  private def committedBatchDirs(spark: SparkSession, path: String,
      ltBatch: Long): Seq[String] =
    BatchStore.committedBatchDirs(spark, path, ltBatch)

  /** All near-dup pairs found so far: union of the per-batch outputs
    * (committed batches only — an in-flight or crashed batch is invisible).
    * Empty (not an error) before the first batch commits.
    */
  def pairs(spark: SparkSession, stateRoot: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("ida", LongType),
      StructField("idb", LongType), StructField("j", DoubleType)))
    val dirs = committedBatchDirs(spark, s"$stateRoot/pairs", Long.MaxValue)
    if (dirs.nonEmpty)
      spark.read.schema(schema).parquet(dirs: _*)
        .select(col("ida"), col("idb"), col("j"))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** One batch: candidates within the batch + against all PRIOR batches,
    * exact-verified, then the batch's docs/bands/pairs are committed to
    * `batch=<batchId>` subdirs. Public because it is also the BACKFILL
    * entry point: bootstrap the store from an existing corpus with one
    * `ingest(spark, corpus, root, 0L)` call, then `start` the stream with
    * a checkpoint whose next batch id is higher.
    */
  def ingest(spark: SparkSession, newDocs: DataFrame,
      root: String, batchId: Long): Unit = {
    // A crash-retry of a batch the compacted base has already consumed
    // (batchId <= base.through — the visibleDirs `through == ltBatch`
    // read path) must also be a WRITE no-op: its output is already in the
    // base byte-for-byte (spec-pinned), and rewriting batch=<id> at an id
    // every reader ignores is dead recompute plus debris the next
    // compaction has to sweep (r15 review). The docs store is the
    // watermark authority — all three stores compact together.
    if (BatchStore.baseThrough(spark, s"$root/docs") >= batchId) return
    val docs = newDocs.select(col("doc_id"), col("text"))
    // (doc_id, sig, band, bkey) for the new batch — materialized once, both
    // join sides and the store write reuse it
    val keys = docs
      .select(col("doc_id"),
        TextVecExprs.minHashSig(col("text"), 8, TextVec.MinHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(TextVecExprs.bandKeysFromSig(col("sig"), TextVec.Bands))
          .as(Seq("band", "bkey")))
      .localCheckpoint()

    // committed batches below this one, read with the EXPLICIT schema of the
    // current-batch frame: no schema inference over the store (a truncated
    // footer from a crashed write can no longer fail the retry that would
    // overwrite it), and path-level selection prunes exactly like the old
    // `batch < batchId` partition filter did
    def priorOrEmpty(path: String, like: DataFrame): DataFrame = {
      val dirs = committedBatchDirs(spark, path, ltBatch = batchId)
      if (dirs.nonEmpty)
        spark.read.schema(like.schema).parquet(dirs: _*)
          .select(like.columns.map(col).toSeq: _*)
      else like.limit(0)
    }

    val priorBands = priorOrEmpty(s"$root/bands", keys)
    val priorDocs = priorOrEmpty(s"$root/docs", docs)

    // within-batch candidate pairs (q15's self-join, ida < idb)
    val selfCand = keys.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(TextVecExprs.sigMatchCount(col("x.sig"), col("y.sig")) >= 6)
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
    // cross candidates: new batch vs the accumulated store (cost keyed on
    // the new batch's band rows — the store side is join-pruned by key).
    // The doc_id inequality guards against an at-least-once SOURCE
    // re-delivering a document in a LATER batch: without it the replayed
    // doc would self-pair (j = 1.0) against its own stored bands.
    val crossCand = priorBands.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .filter(TextVecExprs.sigMatchCount(col("x.sig"), col("y.sig")) >= 6)
      .select(least(col("x.doc_id"), col("y.doc_id")).as("ida"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("idb"))

    val cand = selfCand.union(crossCand).distinct()
    // dropDuplicates: a re-delivered doc appears in two batches' doc
    // stores; without dedup the verify joins would fan out duplicate rows
    val corpus = priorDocs.union(docs).dropDuplicates("doc_id")
    val verified = cand
      .join(corpus.select(col("doc_id").as("ida"), col("text").as("ta")), "ida")
      .join(corpus.select(col("doc_id").as("idb"), col("text").as("tb")), "idb")
      .withColumn("jraw", TextVecExprs.shingleJaccard(col("ta"), col("tb"), 8))
      .filter(col("jraw") >= 0.6)
      .select(col("ida"), col("idb"), round(col("jraw"), 4).as("j"))

    // commit order: pairs/docs last-to-first doesn't matter — a retry
    // overwrites every `batch=<id>` subdir it touches, and readers exclude
    // the in-flight batch id
    verified.write.mode("overwrite").parquet(s"$root/pairs/batch=$batchId")
    keys.write.mode("overwrite").parquet(s"$root/bands/batch=$batchId")
    docs.write.mode("overwrite").parquet(s"$root/docs/batch=$batchId")
    // `keys`' localCheckpoint blocks are freed by the ContextCleaner once
    // this frame goes out of scope (Dataset.unpersist would be a no-op —
    // checkpoint blocks are not CacheManager entries)
  }

  /** Compact the three stores' accumulated `batch=<id>` deltas into one
    * bucketed base each ([[BatchStore.compactStore]] — the
    * Stash.compactLatest rewrite discipline, r13 verdict item 3): a
    * long-running stream otherwise accumulates parallelism-many kilobyte
    * files per batch forever, and footer planning time comes to dominate
    * every store read. Each store buckets on its probe key (bands on the
    * band key the per-batch join hits, docs on doc_id, pairs on ida), so
    * the compacted layout co-locates exactly what later batches look up.
    * MUST run on a QUIESCED store. For a MANUAL call that means stop the
    * query, compact, restart (the Stash.compactLatest contract); the one
    * other quiesced point is INSIDE the stream's own foreachBatch
    * boundary after the batch's ingest returns — batches serialize, so
    * nothing else writes there — which is exactly where [[start]]'s
    * `compactEvery` policy calls this. Ingestion after compaction
    * continues normally, reading base + newer deltas. Returns the highest
    * batch id compacted, or -1 for an empty store.
    */
  def compact(spark: SparkSession, root: String, buckets: Int): Long = {
    val a = BatchStore.compactStore(spark, s"$root/bands", buckets, "bkey")
    val b = BatchStore.compactStore(spark, s"$root/docs", buckets, "doc_id")
    val c = BatchStore.compactStore(spark, s"$root/pairs", buckets, "ida")
    math.max(a, math.max(b, c))
  }
}
