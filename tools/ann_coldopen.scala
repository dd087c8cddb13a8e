// Staged-ANN cold-open latency at the DEPLOYMENT operating point (r16
// verdict item 5): q136 pins exactness (probe all cells, re-rank all);
// the deployment value is (nprobe ≪ cells, rerank ≪ N) served from a
// COMMITTED index by a JVM that never trained it. The cold-open adoption
// path is spec-pinned (PipelineSpec: training counter unmoved); its
// LATENCY was unmeasured — this probe measures it.
//
// Two phases, two JVMs, one shared warehouse:
//   phase=stage  — stageAnnIndex(sf0.1): train + write + commit.
//   phase=cold   — FRESH JVM: time the first annSearchStaged(8, 400)
//                  (adoption metadata read + pruned codes scan) and the
//                  warm steady state, plus recall@5 vs exact q16.
// Run (stage, then cold, each its own spark-shell):
//   for p in stage cold; do SPARK_GRAFT_ANN_PHASE=$p \
//     /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.warehouse.dir=/tmp/graft-ann-wh \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/ann_coldopen.scala <<< ""; done
// Writes tools/bench_ann_coldopen_latest.json (cold phase).
{
  import graft.queries.Pipeline
  val dir = "/root/testdata/sf0.1"
  val phase = sys.env.getOrElse("SPARK_GRAFT_ANN_PHASE", "cold")
  def med(n: Int)(f: => Unit): Double = {
    val ts = Seq.fill(n) { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }.sorted
    ts(n / 2)
  }
  if (phase == "stage") {
    val t = System.nanoTime()
    val idx = Pipeline.stageAnnIndex(spark, dir)
    println(f"""{"phase":"stage","stage_sec":${(System.nanoTime() - t) / 1e9}%.3f,"cells":${idx.cells},"codes":"${idx.codesPath}"}""")
    println("ANN_STAGE_DONE")
  } else {
    // exact top-5 (the recall reference) BEFORE timing, so its scan
    // warm-up never pollutes the cold-open number... except it shares the
    // embeddings scan. Order swapped deliberately: the COLD measurement
    // must come first, exact second (cold-open includes the first
    // embeddings read by design — a cold deployment JVM pays it too).
    val t0 = System.nanoTime()
    val first = Pipeline.annSearchStaged(spark, dir, nprobe = 8, rerank = 400).collect()
    val tCold = (System.nanoTime() - t0) / 1e9
    Seq.fill(3)(Pipeline.annSearchStaged(spark, dir, nprobe = 8, rerank = 400).collect())
    val tWarm = med(7)(Pipeline.annSearchStaged(spark, dir, nprobe = 8, rerank = 400).collect())
    val ann = first.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.TextVec.q16(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    val json = f"""{"metric":"ann_coldopen","sf":"0.1","nprobe":8,"rerank":400,"cold_first_query_sec":$tCold%.3f,"warm_median_sec":$tWarm%.3f,"recall_at5":$recall%.3f,"n_results":${first.length}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_ann_coldopen_latest.json"), json + "\n")
    println(json)
    println("ANN_COLD_DONE")
  }
}
