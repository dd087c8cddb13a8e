package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.TextVec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental (streaming) near-dup path must find EXACTLY the pairs
  * batch q15 finds on the full corpus — no pair lost at a batch boundary,
  * none duplicated across the self/cross candidate paths — and a retried
  * batch must be a no-op.
  */
class IncrementalNearDupSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("incdup").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental ingest over 4 batches == batch q15 on the full corpus") {
    val root = tmp()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    (0 until 4).foreach { b =>
      IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === b),
        root, b.toLong)
    }
    val incremental = canon(IncrementalNearDup.pairs(spark, root))
    val batch = canon(TextVec.q15(spark, sf0001))
    assert(batch.nonEmpty)
    assert(incremental == batch,
      s"missing=${batch -- incremental} extra=${incremental -- batch}")

    // retry of batch 2 (crash-after-commit replay): overwrites only its own
    // batch=2 outputs, reads only batches < 2 — the pair set must not change
    IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === 2),
      root, 2L)
    assert(canon(IncrementalNearDup.pairs(spark, root)) == batch)
  }

  test("compaction: file count drops to the bucket count; pairs unchanged; later batches commit") {
    val root = tmp()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    // 3 batches in, then a quiesced compaction
    (0 until 3).foreach { b =>
      IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === b),
        root, b.toLong)
    }
    val beforePairs = canon(IncrementalNearDup.pairs(spark, root))
    val through = IncrementalNearDup.compact(spark, root, buckets = 4)
    assert(through === 2L, "compaction consumed batches 0..2")
    // the delta dirs are gone; each store is exactly its bucketed base
    for (store <- Seq("bands", "docs", "pairs")) {
      val files = parquetFiles(s"$root/$store")
      assert(files.size <= 4, s"$store has ${files.size} files after compacting to 4 buckets")
      assert(files.forall(_.getPath.contains("/base/v2/")),
        s"$store still holds non-base files: ${files.filterNot(_.getPath.contains("/base/"))}")
    }
    assert(canon(IncrementalNearDup.pairs(spark, root)) == beforePairs,
      "compaction must not change the accumulated pair set")
    // a post-compaction batch reads base + nothing and commits normally;
    // the full 4-batch set must now equal batch q15 exactly
    IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === 3),
      root, 3L)
    assert(canon(IncrementalNearDup.pairs(spark, root)) == canon(TextVec.q15(spark, sf0001)))
    // idempotent no-op re-compaction is safe, then compact the 4th batch in
    assert(IncrementalNearDup.compact(spark, root, buckets = 4) === 3L)
    assert(canon(IncrementalNearDup.pairs(spark, root)) == canon(TextVec.q15(spark, sf0001)))
    // quiesce-violation guard: a reader bounded at or below the base's
    // through must fail loudly (its exact input set no longer exists)
    val e = intercept[IllegalStateException] {
      BatchStore.visibleDirs(spark, s"$root/bands", ltBatch = 2L)
    }
    assert(e.getMessage.contains("non-quiesced"))
  }

  test("retry of a compaction-consumed batch is a no-op, not a wedge (r14 review)") {
    // the operational gap the quiesce contract can't close: a stream stops
    // (or crashes) AFTER its final batch committed to the store but BEFORE
    // the checkpoint recorded it; the operator compacts; the restarted
    // stream retries that batch id. The retry now reads a base containing
    // its own prior output — which must (a) not throw, and (b) reproduce
    // the original attempt's output exactly, because the ingest's
    // self-pairing guards (doc_id inequality + distinct) make reading your
    // own prior commit indistinguishable from not reading it.
    val root = tmp()
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    (0 until 3).foreach { b =>
      IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === b),
        root, b.toLong)
    }
    val before = canon(IncrementalNearDup.pairs(spark, root))
    assert(IncrementalNearDup.compact(spark, root, buckets = 4) === 2L)
    // the retry: same batch id the base consumed — must not throw, and
    // (r15 review) must be a WRITE no-op: its output is already in the
    // base byte-for-byte, so rewriting batch=2 at an id every reader
    // ignores would be dead recompute plus debris for the next compaction
    IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === 2),
      root, 2L)
    assert(!new java.io.File(s"$root/pairs/batch=2").exists,
      "consumed-batch retry must not recreate its swept delta dir")
    assert(!new java.io.File(s"$root/bands/batch=2").exists)
    assert(!new java.io.File(s"$root/docs/batch=2").exists)
    // and the accumulated set is unchanged — the base already carries
    // batch 2's pairs
    assert(canon(IncrementalNearDup.pairs(spark, root)) == before)
    // a GENUINELY NEW batch above the watermark still ingests normally
    IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(4)) === 3),
      root, 3L)
    assert(new java.io.File(s"$root/pairs/batch=3/_SUCCESS").exists,
      "post-compaction ingest of a new batch must commit its delta")
  }

  test("compactEvery policy: long ingest stays file-bounded with no manual compact; pairs identical") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    docs.filter(pmod(col("doc_id"), lit(4)) === 0).coalesce(1).write.mode("overwrite").parquet(in)
    (1 until 4).foreach { b =>
      docs.filter(pmod(col("doc_id"), lit(4)) === b).coalesce(1).write.mode("append").parquet(in)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = IncrementalNearDup.start(stream, root, ckpt,
      compactEvery = 2, compactBuckets = 4)
    q.processAllAvailable(); q.stop()
    // the policy fired inside the batch boundary after batches 1 and 3:
    // the newest base (v3) consumed every delta, so the store's file count
    // is the bucket count — bounded regardless of how long the ingest ran
    for (store <- Seq("pairs", "bands", "docs")) {
      val dirs = new java.io.File(s"$root/$store").listFiles.filter(_.isDirectory).map(_.getName)
      assert(!dirs.exists(_.startsWith("batch=")),
        s"$store still has delta dirs after the policy compaction: ${dirs.toSeq}")
      val files = new java.io.File(s"$root/$store/base/v3").listFiles
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 4,
        s"$store base has ${files.length} files for 4 buckets")
    }
    // and the result is byte-identical to the batch ground truth
    assert(canon(IncrementalNearDup.pairs(spark, root)) == canon(TextVec.q15(spark, sf0001)))
  }

  test("streaming start(): foreachBatch wiring finds cross-batch pairs") {
    val root = tmp(); val in = tmp() + "/in"; val ckpt = tmp() + "/ckpt"
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    // two sequential chunk files (file source processes in mtime order)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("overwrite").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = IncrementalNearDup.start(stream, root, ckpt)
    q.processAllAvailable(); q.stop()
    assert(canon(IncrementalNearDup.pairs(spark, root)) == canon(TextVec.q15(spark, sf0001)))
  }
}
