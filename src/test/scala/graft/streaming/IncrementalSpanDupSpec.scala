package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental span-dup path must flag EXACTLY the documents batch
  * q78 counts as dup-span carriers on the full corpus — both ends of every
  * cross-batch duplicate, no doc lost at a batch boundary — and a retried
  * batch must be a no-op.
  */
class IncrementalSpanDupSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("incspan").toString

  /** q78's (source → n_dup_docs) for sources with at least one flagged doc. */
  private def batchCensus(): Map[String, Long] =
    Pipeline.q78(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).filter(_._2 > 0).toMap

  private def incCensus(root: String): Map[String, Long] =
    IncrementalSpanDup.contaminatedCensus(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("incremental ingest over 3 batches == batch q78's dup-doc census") {
    val root = tmp()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    (0 until 3).foreach { b =>
      IncrementalSpanDup.ingest(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    val batch = batchCensus()
    assert(batch.nonEmpty, "corpus has no duplicated spans — spec is vacuous")
    assert(incCensus(root) == batch)

    // retry of batch 1 (crash-after-commit replay): reads only batches < 1,
    // overwrites only its own subdirs — the flag set must not change
    IncrementalSpanDup.ingest(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), root, 1L)
    assert(incCensus(root) == batch)
  }

  test("compaction mid-stream: census unchanged, stores collapse to buckets, ingest resumes") {
    val root = tmp()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    (0 until 2).foreach { b =>
      IncrementalSpanDup.ingest(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    val mid = incCensus(root)
    assert(IncrementalSpanDup.compact(spark, root, buckets = 4) === 1L)
    assert(incCensus(root) == mid, "compaction must not change the flag census")
    for (store <- Seq("spans", "hits")) {
      val files = parquetFiles(s"$root/$store")
      assert(files.size <= 4 && files.forall(_.getPath.contains("/base/v1/")),
        s"$store not compacted: ${files.map(_.getPath)}")
    }
    // the remaining third of the corpus ingests against the compacted base
    // and the final census equals batch q78's exactly
    IncrementalSpanDup.ingest(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), root, 2L)
    assert(incCensus(root) == batchCensus())
  }

  test("re-delivered document does not self-pair against its own stored spans") {
    val root = tmp()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    // a single long doc ingested twice under at-least-once delivery: its
    // spans match its own store rows only via doc_id equality, which the
    // inequality guard excludes — so nothing may be flagged
    val one = docs.filter(col("doc_id") === docs.agg(min("doc_id")).head().getLong(0))
    IncrementalSpanDup.ingest(spark, one, root, 0L)
    IncrementalSpanDup.ingest(spark, one, root, 1L)
    assert(IncrementalSpanDup.contaminated(spark, root).count() == 0)
  }

  test("streaming start(): foreachBatch wiring flags cross-batch span dups") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("overwrite").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = IncrementalSpanDup.start(stream, root, ckpt)
    q.processAllAvailable(); q.stop()
    assert(incCensus(root) == batchCensus())
  }

  test("compactEvery policy: stores collapse to the base inside the stream; census identical") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("overwrite").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = IncrementalSpanDup.start(stream, root, ckpt,
      compactEvery = 2, compactBuckets = 4)
    q.processAllAvailable(); q.stop()
    for (store <- Seq("spans", "hits")) {
      val dirs = new java.io.File(s"$root/$store").listFiles.filter(_.isDirectory).map(_.getName)
      assert(!dirs.exists(_.startsWith("batch=")),
        s"$store still has delta dirs after the policy compaction: ${dirs.toSeq}")
    }
    assert(incCensus(root) == batchCensus())
  }
}
