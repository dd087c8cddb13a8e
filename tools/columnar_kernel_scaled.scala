// Columnar-kernel A/B at REAL scan scale: sf0.1's events.parquet is 2 MB —
// every variant sits on the ~0.2 s dispatch floor and a 3-SF slope fit is
// noise-bound (tools/bench_columnar_latest.json's first window: full q11
// read FLAT across 100× data). So stage events ×100 (~20M rows) in /tmp
// once and time the variants where the data term dominates the floor:
//   full   — declarative q11 over the big table (via Events.q11's body on
//            a plain read, same plan shape)
//   ckern  — the ColumnarBatch kernel (same oracle semantics)
//   scanct — bare row-boundary scan-agg (the decomposition's "scan" floor)
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/columnar_kernel_scaled.scala <<< ""
// Writes tools/bench_columnar_scaled_latest.json.
import graft.Tables
import org.apache.spark.sql.functions._

val big = "/tmp/graft_events_x100"
val bigFile = new java.io.File(big + "/events.parquet")
if (!bigFile.exists) {
  val ev = Tables.events(spark, "/root/testdata/sf0.1")
  ev.withColumn("rep", explode(lit((0 until 100).toArray)))
    .drop("rep")
    .repartition(32)
    .write.mode("overwrite").parquet(big + "/events.parquet")
}
val nrows = spark.read.parquet(big + "/events.parquet").count()
println(s"big events rows: $nrows")

def med(n: Int)(f: => Unit): Double = {
  val ts = Seq.fill(n) {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
  }.sorted
  ts(n / 2)
}

def vFull() = graft.queries.Events.q11(spark, big)
def vCkern() = graft.queries.Events.q11ColumnarKernel(spark, big)
def vScanct() = Tables.events(spark, big).select(col("ts")).
  groupBy(to_date(date_trunc("day", col("ts"))).as("d")).count().orderBy("d")

Seq.fill(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())
val floor0 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
  ("scanct", () => vScanct()), ("full", () => vFull()), ("ckern", () => vCkern()))
for ((_, f) <- variants) { f().collect(); f().collect() }
// two interleaved blocks so a drift hits all variants
val meas = (1 to 2).flatMap { block =>
  variants.map { case (name, f) => (name, block, med(5)(f().collect())) }
}
val floor1 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

val rows = variants.map { case (name, _) =>
  val ts = meas.collect { case (`name`, _, t) => t }
  f""""$name":{"blocks":[${ts.map(t => f"$t%.4f").mkString(",")}],"best":${ts.min}%.4f}"""
}
val json = f"""{"metric":"columnar_kernel_scaled","rows":$nrows,"floor_start_sec":$floor0%.4f,"floor_end_sec":$floor1%.4f,${rows.mkString(",")}}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_columnar_scaled_latest.json"), json + "\n")
println(json)
println("COLUMNAR_SCALED_DONE")
