package graft.streaming

import graft.expressions.TextVecExprs
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental exact duplicated-span detection — the streaming form of
  * q78's census, against a PERSISTED span store. Where
  * [[IncrementalNearDup]] answers "is this new document a near-copy of a
  * known one", this answers the finer memorization-risk question: "does
  * any 40-char span of this new document appear verbatim anywhere in the
  * accumulated corpus" — and, symmetrically, which ALREADY-INGESTED
  * documents the new arrival just contaminated.
  *
  * Why this shape at 100 TB: re-running the corpus-wide span census per
  * arrival batch is O(corpus) work every batch. Here each batch pays
  * O(batch chars) to shingle itself; the store probe is one equi-join on
  * the 8-byte span hash where the batch side is small enough to broadcast,
  * so the store streams through map-side — no store-side shuffle. State is
  * batch-partitioned parquet (`batch=<id>` subdirs with `_SUCCESS`
  * markers), not executor memory, so it survives restarts; on a real
  * deployment the span store would be bucketed by hash (pay-shuffle-once,
  * cf. BucketedJoinSpec).
  *
  * Exactly-once: identical discipline to [[IncrementalNearDup]] — every
  * write overwrites the batch's OWN `batch=<id>` subdir, reads exclude
  * ids >= the current batch, and only `_SUCCESS`-marked dirs are visible,
  * so a retried batch reproduces its output byte-for-byte.
  *
  * Both ENDS of a cross-batch duplicate are flagged (the new doc AND the
  * stored doc it hit), which is what makes the accumulated flag set equal
  * to batch q78's — proven in the spec by split-ingesting the corpus and
  * comparing against `Pipeline.q78` per source.
  */
object IncrementalSpanDup {

  /** Start the ingestion stream: `docs` must carry (doc_id, source, text).
    *
    * `compactEvery` > 0 compacts the stores after every `compactEvery`-th
    * committed batch, from inside the foreachBatch boundary where the
    * quiesce contract holds for free — see [[IncrementalNearDup.start]]
    * for the full argument (serialized batches; retry lands on
    * visibleDirs' permitted `through == ltBatch` path).
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

  private def committedBatchDirs(spark: SparkSession, path: String,
      ltBatch: Long): Seq[String] =
    BatchStore.committedBatchDirs(spark, path, ltBatch)

  /** Every (doc_id, source) flagged so far, deduped across batches: a doc
    * hit in several batches (or flagged once as the stored end and again
    * on re-delivery) appears once. Empty before the first commit.
    */
  def contaminated(spark: SparkSession, stateRoot: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType)))
    val dirs = committedBatchDirs(spark, s"$stateRoot/hits", Long.MaxValue)
    if (dirs.nonEmpty)
      spark.read.schema(schema).parquet(dirs: _*)
        .select(col("doc_id"), col("source")).distinct()
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Per-source contaminated-doc counts from the accumulated flag set —
    * directly comparable to q78's (source, n_dup_docs) columns once the
    * whole corpus is ingested.
    */
  def contaminatedCensus(spark: SparkSession, stateRoot: String): DataFrame =
    contaminated(spark, stateRoot)
      .groupBy("source").agg(count(lit(1)).as("n_dup_docs"))
      .orderBy("source")

  /** One batch: flag in-batch span duplicates plus BOTH ends of every
    * batch↔store span match, then commit the batch's spans and hits to
    * `batch=<batchId>` subdirs. Public because it is also the backfill
    * entry point (`ingest(spark, corpus, root, 0L)`), mirroring
    * [[IncrementalNearDup.ingest]].
    */
  def ingest(spark: SparkSession, newDocs: DataFrame,
      root: String, batchId: Long): Unit = {
    // Write no-op for a crash-retry of a batch the compacted base already
    // consumed — same contract and rationale as
    // [[IncrementalNearDup.ingest]]'s guard (r15 review); the spans store
    // is the watermark authority, both stores compact together.
    if (BatchStore.baseThrough(spark, s"$root/spans") >= batchId) return
    // (doc_id, source, sg) for the new batch — per-doc-deduped 40-char
    // hashed spans, materialized once: three probes and the store write
    // reuse it without re-shingling. The row-level distinct() also absorbs
    // an at-least-once source delivering the SAME document twice inside one
    // micro-batch: without it those spans would appear twice, trip the
    // within-batch count(*) > 1, and permanently self-flag the doc (the
    // cross-batch join already guards this case via the doc_id inequality;
    // this makes the within-batch path equally re-delivery-tolerant).
    val spans = newDocs
      .select(col("doc_id"), col("source"),
        explode(TextVecExprs.shingleHashes(col("text"), 40)).as("sg"))
      .distinct()
      .localCheckpoint()

    def priorOrEmpty(path: String): DataFrame = {
      val dirs = committedBatchDirs(spark, path, ltBatch = batchId)
      if (dirs.nonEmpty)
        spark.read.schema(spans.schema).parquet(dirs: _*)
          .select(spans.columns.map(col).toSeq: _*)
      else spans.limit(0)
    }
    val priorSpans = priorOrEmpty(s"$root/spans")

    // within-batch: spans are deduped per doc, so count(*) per sg is the
    // distinct-doc count (q78's identity)
    val withinKeys = spans.groupBy("sg")
      .agg(count(lit(1)).as("nd")).filter(col("nd") > 1).select("sg")
    val withinHits = spans
      .join(withinKeys, Seq("sg"), "left_semi")
      .select("doc_id", "source")

    // cross-batch: every store row sharing a span with the batch flags
    // BOTH its own doc (the stored end) and the batch doc. The doc_id
    // inequality keeps an at-least-once source's re-delivered document
    // from self-pairing against its own stored spans. The batch side is
    // the small one — AQE broadcasts it, so the store never shuffles.
    val crossPairs = priorSpans.as("p").join(spans.as("n"),
        col("p.sg") === col("n.sg") && col("p.doc_id") =!= col("n.doc_id"))
    val crossHits = crossPairs.select(col("p.doc_id"), col("p.source"))
      .union(crossPairs.select(col("n.doc_id"), col("n.source")))

    withinHits.union(crossHits).distinct()
      .write.mode("overwrite").parquet(s"$root/hits/batch=$batchId")
    spans.write.mode("overwrite").parquet(s"$root/spans/batch=$batchId")
  }

  /** Compact both stores' `batch=<id>` deltas into one bucketed base each
    * — [[IncrementalNearDup.compact]]'s twin over the span store (spans
    * bucket on the span hash the probe join hits, hits on doc_id). Same
    * contract: run quiesced — either stop-compact-restart manually, or
    * from inside the foreachBatch boundary where [[start]]'s
    * `compactEvery` policy calls it (batches serialize there, so the
    * store is quiesced for free); ingestion then resumes against
    * base + newer deltas. Returns the highest batch id compacted.
    */
  def compact(spark: SparkSession, root: String, buckets: Int): Long =
    math.max(
      BatchStore.compactStore(spark, s"$root/spans", buckets, "sg"),
      BatchStore.compactStore(spark, s"$root/hits", buckets, "doc_id"))
}
