package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The one copy of the incremental stores' commit-discovery rule
  * ([[IncrementalNearDup]], [[IncrementalSpanDup]], [[SnapshotMonitor]]):
  * a batch's output is visible iff its `batch=<id>` subdir carries the
  * committer's `_SUCCESS` marker AND its id is strictly below the reading
  * batch — so a retried batch never sees its own (possibly partial) prior
  * attempt, which is what makes the overwrite-own-subdir discipline
  * exactly-once.
  *
  * Compaction (r13 verdict item 3 — months of streaming must not mean
  * unbounded small files): [[compactStore]] merges every visible dir into
  * ONE bucketed `base/v<through>` directory, where `through` is the
  * highest batch id consumed. Readers take the newest committed base plus
  * only the batch dirs ABOVE its `through` — so the instant the base
  * commits, the consumed batch dirs are invisible (deleting them
  * afterwards is pure GC, not a correctness step), and a crash between
  * commit and GC double-counts nothing. This is [[graft.kv.Stash]]'s
  * version discipline (openLatest picks the max committed version) grafted
  * onto delta stores: the base is a full merge, the deltas above it stay
  * incremental. Like `Stash.compactLatest`, compaction MUST run on a
  * QUIESCED store — the guard below turns a violated quiesce (a reader
  * whose bound sits at or below the base's `through`, which could no
  * longer see its exact input set) into a loud error instead of a silent
  * wrong answer.
  */
private[graft] object BatchStore {

  /** Committed (id, dir) pairs under `path` with id < ltBatch, id-ascending. */
  def committedBatches(spark: SparkSession, path: String,
      ltBatch: Long): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap { d =>
        val name = d.getPath.getName
        if (name.matches("batch=\\d+")) Some((name.drop(6).toLong, d.getPath))
        else None
      }
      .filter { case (id, dir) =>
        id < ltBatch && fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
      }
      .sortBy(_._1)
      .map { case (id, dir) => (id, dir.toString) }
  }

  /** Committed (through, dir) base versions under `path`/base, ascending. */
  private def committedBases(spark: SparkSession, path: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/base")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap { d =>
        val name = d.getPath.getName
        if (name.matches("v\\d+") &&
            fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_SUCCESS")))
          Some((name.drop(1).toLong, d.getPath.toString))
        else None
      }
      .sortBy(_._1)
  }

  /** The newest committed base's `through` watermark, or -1 when the
    * store has never compacted. Ingest paths consult this to no-op a
    * crash-retry of a batch the base has already consumed: such a retry's
    * `batch=<id>` rewrites land at ids every reader ignores and the next
    * compaction merely sweeps — dead recompute + transient debris
    * (r15 review).
    */
  def baseThrough(spark: SparkSession, path: String): Long =
    committedBases(spark, path).lastOption.map(_._1).getOrElse(-1L)

  /** Everything a reader bounded by `ltBatch` may see: the newest
    * committed base (if any) plus the committed batch dirs above its
    * `through` and below `ltBatch`.
    *
    * The one permitted overrun: `through == ltBatch` — a RETRY of the
    * exact batch the base consumed. A stopped/crashed stream can leave
    * its final batch store-committed but never checkpoint-committed; if a
    * compaction then consumed it, the restarted stream retries that batch
    * id against a base containing its own prior output. That read is
    * SOUND for these stores by construction: both ingests are
    * re-delivery-tolerant (the doc_id-inequality guards exclude
    * self-pairing, and within-batch duplicates collapse under the final
    * `distinct`), so the retry's candidate/flag set — and therefore its
    * overwritten output — is byte-identical to the original attempt's
    * (spec-pinned: "retry of a compaction-consumed batch"). Anything
    * PAST the retrying batch (`through > ltBatch`) means later batches
    * were merged in — a real quiesce violation the reader cannot unsee —
    * and throws.
    */
  def visibleDirs(spark: SparkSession, path: String, ltBatch: Long): Seq[String] = {
    val bases = committedBases(spark, path)
    bases.lastOption match {
      case Some((through, _)) if through > ltBatch =>
        throw new IllegalStateException(
          s"$path: base v$through has consumed batch ids > the reader's bound " +
          s"$ltBatch — compaction ran on a non-quiesced store; the reader's " +
          "exact input set no longer exists")
      case Some((through, dir)) =>
        dir +: committedBatches(spark, path, ltBatch)
          .collect { case (id, d) if id > through => d }
      case None =>
        committedBatches(spark, path, ltBatch).map(_._2)
    }
  }

  /** Just the committed dirs, id-ascending (base first when present). */
  def committedBatchDirs(spark: SparkSession, path: String,
      ltBatch: Long): Seq[String] =
    visibleDirs(spark, path, ltBatch)

  /** Merge every visible dir of one store into `buckets` key-hashed files
    * committed as `base/v<through>`; then GC the consumed batch dirs and
    * older bases (both already invisible to readers the moment the new
    * base commits). `distinct` dedupes rows an at-least-once source
    * landed in several batches (every reader of these stores already
    * dedupes, so multiplicity was never part of the contract). No-op when
    * nothing new committed since the last base. Returns the new (or
    * current) base `through`, or -1 when the store is empty.
    */
  def compactStore(spark: SparkSession, path: String, buckets: Int,
      keyCol: String): Long = {
    val bases = committedBases(spark, path)
    val priorThrough = bases.lastOption.map(_._1).getOrElse(-1L)
    val fresh = committedBatches(spark, path, Long.MaxValue)
      .filter(_._1 > priorThrough)
    val through =
      if (fresh.isEmpty) priorThrough
      else {
        val t = fresh.map(_._1).max
        val dirs = bases.lastOption.map(_._2).toSeq ++ fresh.map(_._2)
        spark.read.parquet(dirs: _*).distinct()
          .repartition(buckets, col(keyCol))
          .write.mode("overwrite").parquet(s"$path/base/v$t")
        t
      }
    // GC everything the newest base makes invisible — including leftovers
    // from a prior compaction that crashed between commit and GC (the
    // fresh.isEmpty no-op path still sweeps those). UNCOMMITTED dirs in
    // range are swept too: with the store quiesced (the contract) a
    // markerless dir can only be a crashed write — a retried batch would
    // have overwritten-and-committed it, and a crashed base write the
    // size of the whole store must not leak forever (r14 review).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sweep(parent: org.apache.hadoop.fs.Path, pattern: String, drop: Int,
        bound: Long => Boolean): Unit =
      if (fs.exists(parent)) fs.listStatus(parent).toSeq.filter(_.isDirectory)
        .foreach { d =>
          val name = d.getPath.getName
          if (name.matches(pattern) && bound(name.drop(drop).toLong))
            fs.delete(d.getPath, true)
        }
    sweep(p, "batch=\\d+", 6, _ <= through)
    sweep(new org.apache.hadoop.fs.Path(s"$path/base"), "v\\d+", 1, _ < through)
    through
  }
}
