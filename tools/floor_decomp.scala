// Per-query floor decomposition (r13 verdict item 6): for each remaining
// >2x-absolute B-set entry (q4, q6, q11, q13, q14 — q9a/q114 already has
// its record in PERF.md), split the BEST form's engine time into
//   e(sf) = floor + m * sf        (least squares over sf 0.001/0.01/0.1)
// so BASELINE.md's "record actuals and flag" rule holds per query: `floor`
// is the per-query dispatch constant (what a 1000-executor scale-up
// amortizes away), `m * 0.1` is the data term actually comparable to the
// oracle's sf0.1 time. The run's own floor probes bracket host health.
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1000000 \
//     --conf spark.sql.autoBroadcastJoinThreshold=67108864 \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/floor_decomp.scala <<< ""
// Writes tools/bench_floor_decomp_latest.json.
{
import graft.{Layouts, Tables}
import graft.queries.{Events, Relational, TextVec}
import org.apache.spark.sql.functions._

def med(n: Int)(f: => Unit): Double = {
  val ts = Seq.fill(n) {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
  }.sorted
  ts(n / 2)
}

val dirs = Seq(0.001 -> "/root/testdata/sf0.001", 0.01 -> "/root/testdata/sf0.01",
  0.1 -> "/root/testdata/sf0.1")

def floorProbe(d: String): Double = {
  Seq.fill(5)(Tables.region(spark, d).groupBy().count().collect())
  med(5)(Tables.region(spark, d).groupBy().count().collect())
}

// (query, best form) — the hash-gated fastest physical form per r13g
val cases = Seq[(String, String => org.apache.spark.sql.DataFrame)](
  ("q4",  d => Relational.q4ColumnarKernel(spark, d)),
  ("q6",  d => Relational.q6ColumnarKernel(spark, d)),
  ("q11", d => Events.q11ColumnarKernel(spark, d)),
  ("q13", d => Events.q13FromColumnarSortedKernel(Layouts.eventsByUserCached(spark, d))),
  ("q14", d => TextVec.q14ColumnarKernel(spark, d)))

// stage the q13 layout per SF OUTSIDE every timed region
dirs.foreach { case (_, d) => Layouts.eventsByUserCached(spark, d) }

val f0 = floorProbe(dirs.head._2)

// least squares e = c + m*sf over the three (sf, e) points
def fit(pts: Seq[(Double, Double)]): (Double, Double, Double) = {
  val n = pts.size.toDouble
  val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
  val sxx = pts.map(p => p._1 * p._1).sum
  val sxy = pts.map(p => p._1 * p._2).sum
  val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
  val c = (sy - m * sx) / n
  val resid = pts.map { case (x, y) => math.abs(y - (c + m * x)) }.max
  (c, m, resid)
}

val results = cases.map { case (name, fn) =>
  val pts = dirs.map { case (sf, d) =>
    Seq.fill(3)(fn(d).collect())               // warm: plan + codegen + JIT
    sf -> med(5)(fn(d).collect())
  }
  val (c, m, resid) = fit(pts)
  val s01 = pts.last._2
  System.err.println(f"[decomp] $name floor=$c%.4f data01=${m * 0.1}%.4f " +
    f"e01=$s01%.4f resid=$resid%.4f")
  (name, pts, c, m, resid, s01)
}

val f1 = floorProbe(dirs.head._2)

def num(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
val body = results.map { case (name, pts, c, m, resid, s01) =>
  val pjson = pts.map { case (sf, e) => s"""{"sf":$sf,"e":${num(e)}}""" }.mkString("[", ",", "]")
  s""""$name":{"points":$pjson,"floor_sec":${num(c)},"m":${num(m)},""" +
    s""""data_term_sf01":${num(m * 0.1)},"e_sf01":${num(s01)},"resid":${num(resid)}}"""
}.mkString(",")
val json = s"""{"metric":"floor_decomposition","floor_start_sec":${num(f0)},""" +
  s""""floor_end_sec":${num(f1)},$body}"""
java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/tools/bench_floor_decomp_latest.json"),
  json.getBytes)
println(json)
}
