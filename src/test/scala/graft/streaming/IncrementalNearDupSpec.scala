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
