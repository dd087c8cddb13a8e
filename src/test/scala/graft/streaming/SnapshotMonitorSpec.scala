package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental monitor's history must equal batch [[Pipeline
  * .snapshotDiff]] run on each consecutive revision pair, the first
  * revision must land entirely as additions, and a retried batch must
  * reproduce its census byte-for-byte.
  */
class SnapshotMonitorSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("snapmon").toString

  private def rev(n: Int) = {
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    n match {
      case 0 => base
      case 1 => base.filter(pmod(col("doc_id"), lit(3)) =!= 0) // removals
      case _ => base.filter(pmod(col("doc_id"), lit(3)) =!= 0) // + changes
        .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
    }
  }

  private def censusRows(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "n_removed", "n_added", "n_changed", "n_unchanged")
      .collect().map(_.toSeq).toSeq

  test("3-revision history == batch snapshotDiff per consecutive pair; first revision all-added") {
    val root = tmp()
    (0 to 2).foreach(b => SnapshotMonitor.ingest(spark, rev(b), root, b.toLong))
    val hist = SnapshotMonitor.history(spark, root).collect()
      .groupBy(_.getLong(5))
      .map { case (b, rows) => b -> rows.map(_.toSeq.take(5)).toSeq }
    // batch 0: everything added, nothing else
    hist(0L).foreach { r =>
      assert(r(1) == 0L && r(3) == 0L && r(4) == 0L && r(2).asInstanceOf[Long] > 0L)
    }
    // batches 1 and 2 equal the batch-mode diff of their revision pairs
    assert(hist(1L) == censusRows(Pipeline.snapshotDiff(rev(0), rev(1))))
    assert(hist(2L) == censusRows(Pipeline.snapshotDiff(rev(1), rev(2))))
    // the constructed revisions exercise removed AND changed branches
    assert(hist(1L).map(_(1).asInstanceOf[Long]).sum > 0, "removals must fire")
    assert(hist(2L).map(_(3).asInstanceOf[Long]).sum > 0, "changes must fire")

    // retry of batch 2 (crash-after-commit replay): diffs against the same
    // predecessor (highest committed id < 2) — history must not change
    val before = SnapshotMonitor.history(spark, root).collect().map(_.toSeq).toSeq
    SnapshotMonitor.ingest(spark, rev(2), root, 2L)
    val after = SnapshotMonitor.history(spark, root).collect().map(_.toSeq).toSeq
    assert(before == after)
  }

  test("crash between digest and diff commits: census row lost, lineage intact (r10 ADVICE order)") {
    // ingest commits digests BEFORE diffs, so the only possible partial
    // state is "digests committed, diff missing". Simulate that crash for
    // batch 1 by ingesting it fully and deleting its diff commit; then:
    //  - history() must surface batches 0 and 2 only (no phantom row);
    //  - batch 2, ingested AFTER the crash, must still diff against
    //    batch 1's digests — never silently against batch 0.
    val root = tmp()
    SnapshotMonitor.ingest(spark, rev(0), root, 0L)
    SnapshotMonitor.ingest(spark, rev(1), root, 1L)
    // crash simulation: batch 1's diff never committed
    val diff1 = new java.io.File(s"$root/diffs/batch=1")
    assert(diff1.isDirectory)
    org.apache.commons.io.FileUtils.deleteDirectory(diff1)
    SnapshotMonitor.ingest(spark, rev(2), root, 2L)
    val hist = SnapshotMonitor.history(spark, root).collect()
      .groupBy(_.getLong(5))
      .map { case (b, rows) => b -> rows.map(_.toSeq.take(5)).toSeq }
    assert(hist.keySet == Set(0L, 2L), s"unexpected batches: ${hist.keySet}")
    assert(hist(2L) == censusRows(Pipeline.snapshotDiff(rev(1), rev(2))),
      "batch 2 must diff against batch 1's committed digests, not batch 0")
    // and a RETRY of the crashed batch restores the full history exactly
    SnapshotMonitor.ingest(spark, rev(1), root, 1L)
    val hist2 = SnapshotMonitor.history(spark, root).collect()
      .groupBy(_.getLong(5))
      .map { case (b, rows) => b -> rows.map(_.toSeq.take(5)).toSeq }
    assert(hist2.keySet == Set(0L, 1L, 2L))
    assert(hist2(1L) == censusRows(Pipeline.snapshotDiff(rev(0), rev(1))))
  }

  test("streaming start(): foreachBatch wiring diffs successive file-borne revisions") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    // two revision files arriving one per trigger: full corpus, then a cut
    rev(0).coalesce(1).write.mode("overwrite").parquet(in)
    rev(1).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(rev(0).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SnapshotMonitor.start(stream, root, ckpt)
    q.processAllAvailable(); q.stop()
    val hist = SnapshotMonitor.history(spark, root).collect()
      .groupBy(_.getLong(5))
      .map { case (b, rows) => b -> rows.map(_.toSeq.take(5)).toSeq }
    assert(hist.keySet == Set(0L, 1L))
    hist(0L).foreach(r => assert(r(1) == 0L && r(2).asInstanceOf[Long] > 0L))
    assert(hist(1L) == censusRows(Pipeline.snapshotDiff(rev(0), rev(1))))
  }

  test("compactEvery policy: diffs collapse to a base, superseded digests GC'd, history identical") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    // four file-borne revisions (the last repeats rev(2): an all-unchanged
    // diff is a legal revision), policy fires after batches 1 and 3
    rev(0).coalesce(1).write.mode("overwrite").parquet(in)
    Seq(rev(1), rev(2), rev(2)).foreach(_.coalesce(1).write.mode("append").parquet(in))
    val stream = spark.readStream.schema(rev(0).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SnapshotMonitor.start(stream, root, ckpt,
      compactEvery = 2, compactBuckets = 2)
    q.processAllAvailable(); q.stop()
    // diffs: one bucketed base, no delta dirs left under it
    val diffDirs = new java.io.File(s"$root/diffs").listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(!diffDirs.exists(_.startsWith("batch=")),
      s"diffs still has delta dirs: ${diffDirs.toSeq}")
    // digests: revisions supersede — only the newest two survive the GC
    val digestDirs = new java.io.File(s"$root/digests").listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(digestDirs.toSeq == Seq("batch=2", "batch=3"),
      s"digest GC kept: ${digestDirs.toSeq}")
    // history identical to an uncompacted manual-ingest run of the same
    // revision sequence (batch ids align by construction)
    val manual = tmp()
    Seq(rev(0), rev(1), rev(2), rev(2)).zipWithIndex
      .foreach { case (r, b) => SnapshotMonitor.ingest(spark, r, manual, b.toLong) }
    val got = SnapshotMonitor.history(spark, root).collect().map(_.toSeq).toSeq
    val want = SnapshotMonitor.history(spark, manual).collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
