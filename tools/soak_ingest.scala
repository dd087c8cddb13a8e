// 50-batch ingest soak for the incremental stores (r16 verdict item 7):
// the compaction specs pin correctness at 3–4 batches; this probe runs a
// long ingest — 50 near-dup batches and 50 snapshot revisions, the
// auto-compaction cadence (every 4) — and records the per-batch wall
// curve plus the store file-count sawtooth, so "file counts bounded AND
// per-batch time flat" is a measured artifact, not an extrapolation.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   -I /root/repo/tools/soak_ingest.scala <<< ""
// Writes tools/bench_soak_latest.json.
{
  import graft.Tables
  import graft.streaming.{IncrementalNearDup, SnapshotMonitor}
  import org.apache.spark.sql.functions._

  val dir = "/root/testdata/sf0.01"
  val batches = 50
  val compactEvery = 4
  def files(root: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(root))
  }
  def fmt(xs: Seq[Double]): String = xs.map(v => f"$v%.3f").mkString("[", ",", "]")
  def fmtI(xs: Seq[Int]): String = xs.mkString("[", ",", "]")
  // flatness: late-batch median vs early steady-state median (skip the
  // first 4 warm-up batches). A store whose per-batch cost grows with
  // accumulated history would trend up monotonically; < 1.5x says flat
  // to within host jitter.
  def flat(ts: Seq[Double]): (Double, Boolean) = {
    def med(s: Seq[Double]) = s.sorted.apply(s.size / 2)
    val early = med(ts.slice(4, 15)); val late = med(ts.takeRight(10))
    (late / early, late / early < 1.5)
  }

  val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
  docs.count() // warm the scan

  // ---- near-dup store: 50 disjoint slices, compact every 4 ----
  val ndRoot = java.nio.file.Files.createTempDirectory("soak-nd").toString
  val ndTimes = (0 until batches).map { b =>
    val t = System.nanoTime()
    IncrementalNearDup.ingest(spark, docs.filter(pmod(col("doc_id"), lit(batches)) === b),
      ndRoot, b.toLong)
    if ((b + 1) % compactEvery == 0) IncrementalNearDup.compact(spark, ndRoot, buckets = 8)
    (System.nanoTime() - t) / 1e9
  }
  val ndFiles = files(ndRoot) // post-soak steady state (just compacted at 48)
  val (ndRatio, ndFlat) = flat(ndTimes)

  // exactness after the soak: accumulated pairs == one-shot q15 on the
  // full corpus (the 4-batch spec's assertion, held at 50)
  val soaked = IncrementalNearDup.pairs(spark, ndRoot)
    .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  val oneShot = graft.queries.TextVec.q15(spark, dir)
    .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  val ndExact = soaked == oneShot

  // ---- snapshot monitor: 50 revisions (2% of docs mutate per rev),
  //      digests GC'd to two revisions by compact ----
  val smRoot = java.nio.file.Files.createTempDirectory("soak-sm").toString
  val smTimes = (0 until batches).map { b =>
    val snap = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(batches)) === b,
          concat(col("text"), lit(s" rev$b"))).otherwise(col("text")).as("text"))
    val t = System.nanoTime()
    SnapshotMonitor.ingest(spark, snap, smRoot, b.toLong)
    if ((b + 1) % compactEvery == 0) SnapshotMonitor.compact(spark, smRoot, buckets = 8)
    (System.nanoTime() - t) / 1e9
  }
  val smFiles = files(smRoot)
  def digestRevCount: Int = Option(new java.io.File(s"$smRoot/digests").listFiles)
    .getOrElse(Array.empty).count(f => f.isDirectory && f.getName.startsWith("batch="))
  // the GC-to-two contract holds AT COMPACTION boundaries; between them
  // up to (compactEvery - 1) fresh revisions legitimately accumulate on
  // top of the kept pair. Record the mid-cycle census, then run one
  // explicit final compact and require exactly the kept pair.
  val digestRevsMidCycle = digestRevCount
  SnapshotMonitor.compact(spark, smRoot, buckets = 8)
  val digestRevsAfterCompact = digestRevCount
  val revsBounded = digestRevsMidCycle <= 2 + (batches % compactEvery).max(compactEvery - 1) &&
    digestRevsAfterCompact == 2
  val (smRatio, smFlat) = flat(smTimes)
  val histRows = SnapshotMonitor.history(spark, smRoot).count()

  val json =
    f"""{"metric":"ingest_soak","batches":$batches,"compact_every":$compactEvery,"sf":"0.01",""" +
    f""""neardup":{"per_batch_sec":${fmt(ndTimes)},"late_over_early":$ndRatio%.3f,"flat":$ndFlat,"files_final":$ndFiles,"pairs_equal_oneshot":$ndExact},""" +
    f""""snapshot":{"per_batch_sec":${fmt(smTimes)},"late_over_early":$smRatio%.3f,"flat":$smFlat,"files_final":$smFiles,"digest_revisions_mid_cycle":$digestRevsMidCycle,"digest_revisions_after_compact":$digestRevsAfterCompact,"history_rows":$histRows},""" +
    f""""pass":${ndFlat && smFlat && ndExact && revsBounded}}"""
  java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_soak_latest.json"), json + "\n")
  println(json)
  println("SOAK_DONE")
}
