// Columnar-kernel A/B (round 12, ColumnarScan seam): does consuming the
// parquet scan's ColumnarBatches directly (Events.q11ColumnarKernel,
// driver-gated as q100) actually remove the vectorized-reader→row
// boundary constant that the q11 decomposition proved is the family's
// whole marginal (tools/bench_q11_decomp_latest.json)?
// Variants, timed back-to-back per SF:
//   full  — declarative q11 (the 3.44-marginal baseline)
//   ckern — q11ColumnarKernel (same oracle, columnar consume)
// Least-squares marginal per variant over the 3 SFs. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/columnar_kernel_bench.scala <<< ""
// Writes tools/bench_columnar_latest.json.
import graft.Tables
import org.apache.spark.sql.functions._

def med(n: Int)(f: => Unit): Double = {
  val ts = Seq.fill(n) {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
  }.sorted
  ts(n / 2)
}

val dirs = Seq(0.001 -> "/root/testdata/sf0.001", 0.01 -> "/root/testdata/sf0.01",
  0.1 -> "/root/testdata/sf0.1")

def vFull(dir: String) = graft.queries.Events.q11(spark, dir)
def vCkern(dir: String) = graft.queries.Events.q11ColumnarKernel(spark, dir)

Seq.fill(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())
val floor0 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

val variants = Seq[(String, String => org.apache.spark.sql.DataFrame)](
  ("full", vFull), ("ckern", vCkern))
for ((_, f) <- variants; (_, d) <- dirs) { f(d).collect(); f(d).collect(); f(d).collect() }
val meas: Seq[(String, Double, Double)] = dirs.flatMap { case (sf, d) =>
  variants.map { case (name, f) => (name, sf, med(7)(f(d).collect())) }
}

def fit(pts: Seq[(Double, Double)]): (Double, Double) = {
  val n = pts.size
  val xm = pts.map(_._1).sum / n; val ym = pts.map(_._2).sum / n
  val sxx = pts.map(p => (p._1 - xm) * (p._1 - xm)).sum
  val m = pts.map(p => (p._1 - xm) * (p._2 - ym)).sum / sxx
  val a = ym - m * xm
  val resid = pts.map(p => math.abs(p._2 - (a + m * p._1))).max
  (m, resid)
}
val floor1 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

val rows = variants.map { case (name, _) =>
  val pts = meas.collect { case (`name`, sf, t) => (sf, t) }
  val (m, r) = fit(pts)
  val ptsJson = pts.map { case (sf, t) => f"""{"sf":$sf,"e":$t%.4f}""" }.mkString("[", ",", "]")
  f""""$name":{"points":$ptsJson,"m":$m%.4f,"resid":$r%.4f}"""
}
val json = f"""{"metric":"columnar_kernel_ab","floor_start_sec":$floor0%.4f,"floor_end_sec":$floor1%.4f,${rows.mkString(",")}}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_columnar_latest.json"), json + "\n")
println(json)
println("COLUMNAR_AB_DONE")
