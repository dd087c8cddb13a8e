package graft.streaming

import graft.SparkSpec
import graft.expressions.TextVecExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized interleaving fuzz for the delta-store + compaction machinery
  * (r14): arbitrary sequences of ingest / crash-retry / compact /
  * retry-after-compaction must leave [[IncrementalSpanDup]]'s accumulated
  * flag set EXACTLY equal to the batch-computed reference on whatever
  * corpus was delivered — the single invariant everything else
  * (visibleDirs bounds, base commits, GC, the through==ltBatch retry
  * relaxation) exists to protect. Synthetic docs with controlled shared
  * 40-char spans keep every step sub-second; seeds are fixed so failures
  * reproduce.
  */
class BatchStoreFuzzSpec extends SparkSpec {

  /** Reference: every (doc_id, source) holding a 40-char span that occurs
    * in ≥ 2 distinct docs of `corpus` — the same relation the incremental
    * store accumulates, computed in one batch pass.
    */
  private def refFlags(corpus: DataFrame): Set[(Long, String)] = {
    val spans = corpus.select(col("doc_id"), col("source"),
        explode(TextVecExprs.shingleHashes(col("text"), 40)).as("sg"))
      .distinct()
    val dup = spans.groupBy("sg")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") > 1)
    spans.join(dup.select("sg"), Seq("sg"), "left_semi")
      .select("doc_id", "source").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def flags(root: String): Set[(Long, String)] =
    IncrementalSpanDup.contaminated(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("random ingest/retry/compact interleavings == batch reference (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new scala.util.Random(seed)
      // 24 docs: shared exact chunks (≥ 40 chars) force cross- and
      // within-batch duplicates; unique tails keep non-dups distinct
      val chunks = Vector(
        "the quick brown fox jumps over the lazy dog again and again tonight",
        "pack my box with five dozen liquor jugs before the storm arrives now",
        "sphinx of black quartz judge my vow under the midnight winter moon")
      val docs = (0 until 24).map { i =>
        val body =
          if (rnd.nextDouble() < 0.5) chunks(rnd.nextInt(chunks.length))
          else s"entirely unique document body number $i with nothing shared ${rnd.nextLong()}"
        (i.toLong, if (i % 2 == 0) "web" else "book", s"$body tail-$i")
      }.toDF("doc_id", "source", "text")
      docs.cache(); docs.count()

      val root = Files.createTempDirectory(s"bsfuzz$seed").toString
      var delivered = Seq.empty[Int] // batch ids ingested so far
      var batchId = 0L
      def batchDocs(b: Long): DataFrame =
        docs.filter(pmod(col("doc_id"), lit(4)) === (b % 4))
      while (batchId < 5) {
        IncrementalSpanDup.ingest(spark, batchDocs(batchId), root, batchId)
        delivered = delivered :+ batchId.toInt
        rnd.nextInt(4) match {
          case 0 => // crash-after-commit retry of the just-run batch
            IncrementalSpanDup.ingest(spark, batchDocs(batchId), root, batchId)
          case 1 => // quiesced compaction
            IncrementalSpanDup.compact(spark, root, buckets = 3)
          case 2 => // compaction, then a retry of the consumed batch (the
            // stop-before-checkpoint case — must neither throw nor drift)
            IncrementalSpanDup.compact(spark, root, buckets = 3)
            IncrementalSpanDup.ingest(spark, batchDocs(batchId), root, batchId)
          case _ => () // plain advance
        }
        batchId += 1
        val corpus = docs.filter(
          pmod(col("doc_id"), lit(4)).isin(delivered.map(b => Long.box(b % 4)).distinct: _*))
        assert(flags(root) == refFlags(corpus),
          s"seed=$seed after batch ${batchId - 1}: incremental != batch reference")
      }
      docs.unpersist()
    }
  }
}
