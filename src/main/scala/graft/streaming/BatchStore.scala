package graft.streaming

import org.apache.spark.sql.SparkSession

/** The one copy of the incremental stores' commit-discovery rule
  * ([[IncrementalNearDup]], [[IncrementalSpanDup]], [[SnapshotMonitor]]):
  * a batch's output is visible iff its `batch=<id>` subdir carries the
  * committer's `_SUCCESS` marker AND its id is strictly below the reading
  * batch — so a retried batch never sees its own (possibly partial) prior
  * attempt, which is what makes the overwrite-own-subdir discipline
  * exactly-once.
  */
private[streaming] object BatchStore {

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

  /** Just the committed dirs, id-ascending. */
  def committedBatchDirs(spark: SparkSession, path: String,
      ltBatch: Long): Seq[String] =
    committedBatches(spark, path, ltBatch).map(_._2)
}
