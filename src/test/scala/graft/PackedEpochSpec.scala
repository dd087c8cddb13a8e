package graft

import graft.queries.Pipeline
import org.apache.spark.sql.functions._

/** Incremental EPOCH packing (r19): the daily-ingest discipline
  * (IncrementalNearDup / appendAnnIndex) applied to the packed corpus.
  * Committed sequences are immutable training state, so a grown
  * documents table packs only its NEW docs as a new epoch; readers
  * serve the union. q155's driver gate hash-checks the single-epoch
  * plumbing against q153's oracle; THIS spec pins the growth semantics
  * the static gate corpus cannot exercise.
  */
class PackedEpochSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-epoch-$tag").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)],
      mode: String = "overwrite"): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .write.mode(mode).parquet(s"$dir/documents.parquet")
  }

  private def fileListing(root: String): Seq[(String, Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(root)).map(f => (f.getPath, f.length, f.lastModified)).sortBy(_._1)
  }

  test("growth packs only the delta as a new epoch; committed epochs are byte-immutable; union covers every doc once") {
    val dir = freshDir("grow")
    val root = freshDir("root-grow")
    val gen1 = Seq((1L, "s", "a b c"), (2L, "s", "d e f g"), (3L, "s", "h"))
    writeDocs(dir, gen1)
    val n0 = Pipeline.packedEpochStagings.get
    assert(Pipeline.appendPackedEpochs(spark, dir, root) === Seq(0L))
    assert(Pipeline.packedEpochStagings.get === n0 + 1)
    val ep0Files = fileListing(s"$root/ep0")
    // idempotency: same table again commits nothing
    assert(Pipeline.appendPackedEpochs(spark, dir, root) === Seq(0L))
    assert(Pipeline.packedEpochStagings.get === n0 + 1)

    // ingest: two new docs arrive (parquet append — ids are a superset)
    val delta = Seq((10L, "s", "x y z w"), (11L, "s", "q r"))
    writeDocs(dir, delta, mode = "append")
    assert(Pipeline.appendPackedEpochs(spark, dir, root) === Seq(0L, 1L))
    assert(Pipeline.packedEpochStagings.get === n0 + 2)
    assert(fileListing(s"$root/ep0") === ep0Files,
      "an append must not touch the committed epoch's bytes")

    // epoch 1 IS the packing of the delta corpus alone — same fold,
    // same shard formula (the packedSequencesOf seam)
    val deltaDir = freshDir("delta")
    writeDocs(deltaDir, delta)
    val ep1 = spark.read.parquet(s"$root/ep1/seqs")
      .select(col("shard").cast("long"), col("seq"), col("n_docs"),
        col("n_tok"), md5(col("stream")).as("digest"))
      .orderBy("shard", "seq").collect().map(_.toString).toSeq
    val want = Pipeline.q152(spark, deltaDir)
      .select(col("shard"), col("seq"), col("n_docs"), col("n_tok"), col("digest"))
      .orderBy("shard", "seq").collect().map(_.toString).toSeq
    assert(ep1 === want, "an epoch must be q152's packing of its delta corpus")

    // the union covers every doc exactly once (id census over the layout)
    val ids = (0L to 1L).flatMap(e =>
      spark.read.parquet(s"$root/ep$e/ids").collect().map(_.getLong(0)))
    assert(ids.sorted === (gen1 ++ delta).map(_._1).sorted,
      "every doc must land in exactly one epoch")

    // the reader serves base ∪ epochs with the epoch column
    val read = Pipeline.readPackedEpochs(spark, root)
    assert(read.columns.contains("epoch"))
    assert(read.select(sum("n_docs")).head.getLong(0) === 5L)
  }

  test("append-only refusal on a shrunken table; loud read before any commit") {
    val dir = freshDir("shrink")
    val root = freshDir("root-shrink")
    val e0 = intercept[IllegalStateException](Pipeline.readPackedEpochs(spark, root))
    assert(e0.getMessage.contains("no committed epochs"))
    writeDocs(dir, Seq((1L, "s", "a b"), (2L, "s", "c")))
    Pipeline.appendPackedEpochs(spark, dir, root)
    writeDocs(dir, Seq((1L, "s", "a b"))) // doc 2 vanished
    val e = intercept[IllegalStateException](
      Pipeline.appendPackedEpochs(spark, dir, root))
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("a crashed epoch (missing ids commit) is invisible and retried whole — never double-packed") {
    val dir = freshDir("crash")
    val root = freshDir("root-crash")
    writeDocs(dir, Seq((1L, "s", "a b"), (2L, "s", "c d")))
    Pipeline.appendPackedEpochs(spark, dir, root)
    writeDocs(dir, Seq((5L, "s", "e f g")), mode = "append")
    // simulate a crash between the seqs write and the ids commit
    Pipeline.packedSequencesOf(
      spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") === 5L),
      shards = 8, seqLen = 512L)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/ep1/seqs")
    assert(Pipeline.committedEpochsUnder(spark, root) === Seq(0L),
      "an epoch without its ids commit must be invisible")
    // the retry overwrites the corpse and commits epoch 1 exactly once
    assert(Pipeline.appendPackedEpochs(spark, dir, root) === Seq(0L, 1L))
    val ids = (0L to 1L).flatMap(e =>
      spark.read.parquet(s"$root/ep$e/ids").collect().map(_.getLong(0)))
    assert(ids.sorted === Seq(1L, 2L, 5L), "retry must not double-pack")
  }

  test("streaming → packed corpus: one epoch per micro-batch, exactly-once per doc, replay-safe") {
    val work = freshDir("stream")
    val root = freshDir("root-stream")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
    // 4 sequential chunk files (the file source triggers one batch per file)
    (0 until 4).foreach { i =>
      docs.filter(col("doc_id") % 4 === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(s"$work/in")
    }
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
    val q = graft.streaming.Streams.streamIntoPackedEpochs(
      stream(), root, s"$work/ckpt")
    q.processAllAvailable(); q.stop()
    val eps = Pipeline.committedEpochsUnder(spark, root)
    assert(eps === (0L until 4L), "each non-empty micro-batch commits one epoch")
    // every doc packed exactly once, and the token accounting is the
    // corpus invariant regardless of how the stream chunked it
    val ids = eps.flatMap(e =>
      spark.read.parquet(s"$root/ep$e/ids").collect().map(_.getLong(0)))
    val want = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sorted === want.toSeq, "every doc must pack exactly once")
    val gotTok = Pipeline.readPackedEpochs(spark, root)
      .select(sum("n_tok")).head.getLong(0)
    val wantTok = docs.select(
      sum(least(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
        lit(512L)))).head.getLong(0)
    assert(gotTok === wantTok, "token totals are chunking-invariant")
    // REPLAY from a fresh checkpoint (the whole input re-fires): the
    // already-packed anti-join commits nothing — exactly-once per doc
    // holds across replays, not just restarts
    val n = Pipeline.packedEpochStagings.get
    val q2 = graft.streaming.Streams.streamIntoPackedEpochs(
      stream(), root, s"$work/ckpt2")
    q2.processAllAvailable(); q2.stop()
    assert(Pipeline.committedEpochsUnder(spark, root) === (0L until 4L))
    assert(Pipeline.packedEpochStagings.get === n, "a replay must commit nothing")
  }

  test("q155 on a static corpus == q153 with epoch 0; growth flows through; cold open adopts; regeneration re-stages") {
    val dir = freshDir("q155")
    writeDocs(dir, Seq((1L, "s", "a b c"), (2L, "s", "d e")))
    val viaEpochs = Pipeline.q155(spark, dir).collect()
    val viaPacked = Pipeline.q153(spark, dir).collect()
    assert(viaEpochs.map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq ===
      viaPacked.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq)
    assert(viaEpochs.forall(_.getLong(2) === 0L), "static corpus = one epoch 0")

    // growth: the new doc lands in epoch 1, prior rows unchanged
    writeDocs(dir, Seq((9L, "s", "z z z")), mode = "append")
    val grown = Pipeline.q155(spark, dir).collect()
    assert(grown.count(_.getLong(2) === 1L) > 0, "the delta must land in epoch 1")
    assert(grown.filter(_.getLong(2) === 0L).map(_.toString).toSeq ===
      viaEpochs.map(_.toString).toSeq, "epoch 0 rows must be unchanged")

    // cold open: a fresh session adopts the committed root, no new epoch
    val n = Pipeline.packedEpochStagings.get
    val s2 = spark.newSession()
    assert(Pipeline.q155(s2, dir).collect().map(_.toString).toSeq ===
      grown.map(_.toString).toSeq)
    assert(Pipeline.packedEpochStagings.get === n, "cold open must adopt")

    // in-place regeneration (ids vanish): q155 abandons the lineage and
    // stages a fresh root rather than refusing or serving stale epochs
    writeDocs(dir, Seq((7L, "s", "fresh one")))
    val regen = Pipeline.q155(spark, dir).collect()
    assert(regen.forall(_.getLong(2) === 0L), "a regenerated corpus restarts at epoch 0")
    assert(regen.map(_.getLong(3)).sum === 1L)
  }
}
