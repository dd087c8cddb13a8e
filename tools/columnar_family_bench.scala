// Columnar kernel family bench (round 12): every kernel on the
// ColumnarScan seam vs its declarative twin (and, for the layout family,
// vs its row-kernel sibling), fresh-build per rep (the bench protocol's
// dispatch semantics), med(7), sf0.1 plus scaled tables where sf0.1 sits
// under the dispatch floor:
//   events ×100 (10M rows)  — q11 vs q100
//   lineitem ×20 (12M rows) — q1 vs q101
// DuckDB reference times for the scaled tables are recorded by
// tools/columnar_duck_ref.py into the same artifact's duck_* fields.
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.files.maxPartitionBytes=8m \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/columnar_family_bench.scala <<< ""
// Writes tools/bench_columnar_latest.json.
import graft.{Layouts, Tables}
import org.apache.spark.sql.functions._

def med(n: Int)(f: => Unit): Double = {
  val ts = Seq.fill(n) {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
  }.sorted
  ts(n / 2)
}

val sf01 = "/root/testdata/sf0.1"
val bigEv = "/tmp/graft_events_x100"
val bigLi = "/tmp/graft_lineitem_x20"
{
  if (!new java.io.File(bigEv + "/events.parquet").exists) {
    Tables.events(spark, sf01).withColumn("rep", explode(lit((0 until 100).toArray)))
      .drop("rep").repartition(32).write.mode("overwrite").parquet(bigEv + "/events.parquet")
  }
  if (!new java.io.File(bigLi + "/lineitem.parquet").exists) {
    Tables.lineitem(spark, sf01).withColumn("rep", explode(lit((0 until 20).toArray)))
      .drop("rep").repartition(32).write.mode("overwrite").parquet(bigLi + "/lineitem.parquet")
  }
}

Seq.fill(5)(Tables.region(spark, sf01).groupBy().count().collect())
val floor0 = med(5)(Tables.region(spark, sf01).groupBy().count().collect())

val staged = Layouts.eventsByUserCached(spark, sf01)

val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
  ("q11_sf01", () => graft.queries.Events.q11(spark, sf01)),
  ("q100_sf01", () => graft.queries.Events.q11ColumnarKernel(spark, sf01)),
  ("q11_x100", () => graft.queries.Events.q11(spark, bigEv)),
  ("q100_x100", () => graft.queries.Events.q11ColumnarKernel(spark, bigEv)),
  ("q1_sf01", () => graft.queries.Relational.q1(spark, sf01)),
  ("q101_sf01", () => graft.queries.Relational.q1ColumnarKernel(spark, sf01)),
  ("q1_x20", () => graft.queries.Relational.q1(spark, bigLi)),
  ("q101_x20", () => graft.queries.Relational.q1ColumnarKernel(spark, bigLi)),
  ("q13_sf01", () => graft.queries.Events.q13(spark, sf01)),
  ("q93_sf01", () => graft.queries.Events.q13FromSortedKernel(staged)),
  ("q102_sf01", () => graft.queries.Events.q13FromColumnarSortedKernel(staged)),
  ("q12_sf01", () => graft.queries.Events.q12(spark, sf01)),
  ("q92_sf01", () => graft.queries.Events.q12FromSortedKernel(staged)),
  ("q103_sf01", () => graft.queries.Events.q12FromColumnarSortedKernel(staged)),
  ("q6_sf01", () => graft.queries.Relational.q6(spark, sf01)),
  ("q104_sf01", () => graft.queries.Relational.q6ColumnarKernel(spark, sf01)),
  ("q3_sf01", () => graft.queries.Relational.q3(spark, sf01)),
  ("q105_sf01", () => graft.queries.Relational.q3ColumnarKernel(spark, sf01)),
  ("q2_sf01", () => graft.queries.Relational.q2(spark, sf01)),
  ("q106_sf01", () => graft.queries.Relational.q2ColumnarKernel(spark, sf01)),
  ("q5_sf01", () => graft.queries.Relational.q5(spark, sf01)),
  ("q107_sf01", () => graft.queries.Relational.q5ColumnarKernel(spark, sf01)),
  ("q7_sf01", () => graft.queries.Relational.q7(spark, sf01)),
  ("q108_sf01", () => graft.queries.Relational.q7ColumnarKernel(spark, sf01)),
  ("q4_sf01", () => graft.queries.Relational.q4(spark, sf01)),
  ("q109_sf01", () => graft.queries.Relational.q4ColumnarKernel(spark, sf01)),
  ("q10_sf01", () => graft.queries.Events.q10(spark, sf01)),
  ("q110_sf01", () => graft.queries.Events.q10ColumnarKernel(spark, sf01)),
  ("q16_sf01", () => graft.queries.TextVec.q16(spark, sf01)),
  ("q111_sf01", () => graft.queries.TextVec.q16ColumnarKernel(spark, sf01)),
  ("q17_sf01", () => graft.queries.TextVec.q17(spark, sf01)),
  ("q112_sf01", () => graft.queries.TextVec.q17ColumnarKernel(spark, sf01)),
  ("q14_sf01", () => graft.queries.TextVec.q14(spark, sf01)),
  ("q113_sf01", () => graft.queries.TextVec.q14ColumnarKernel(spark, sf01)),
  ("q6_x20", () => {
    val li = spark.read.parquet(bigLi + "/lineitem.parquet")
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")).limit(10)
  }),
  ("q104_x20", () => graft.queries.Relational.q6ColumnarKernel(spark, bigLi)))

// warm: codegen + footers + staging
for ((_, f) <- variants) { f().collect(); f().collect() }
val meas = variants.map { case (name, f) => (name, med(7)(f().collect())) }
val floor1 = med(5)(Tables.region(spark, sf01).groupBy().count().collect())

val fields = meas.map { case (n, t) => f""""$n":$t%.4f""" }.mkString(",")
val json = f"""{"metric":"columnar_family","floor_start_sec":$floor0%.4f,"floor_end_sec":$floor1%.4f,$fields}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_columnar_latest.json"), json + "\n")
println(json)
println("COLUMNAR_FAMILY_DONE")
