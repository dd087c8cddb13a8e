// Weak-list decomposition (r12): for every query still >2x on the merged
// slope artifact, time a BARE variant — the same column projection through
// the same scan (and, where the query's shape requires one, the same
// exchange) with a trivial aggregate — next to the FULL query, at three
// SFs back-to-back in one session. marginal(full) - marginal(bare) is the
// data-proportional cost of the query's OWN operators; the bare marginal
// is the platform's scan(+shuffle) constant that no operator change can
// remove. Turns PERF.md's "shared scan constant" prose into per-query
// measured numbers. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1000000 \
//     --conf spark.sql.autoBroadcastJoinThreshold=67108864 \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/weak_decomp.scala <<< ""
// Writes tools/bench_weak_decomp_latest.json.
import graft.Tables
import graft.queries.{Events, Relational}
import org.apache.spark.sql.functions._

def med(n: Int)(f: => Unit): Double = {
  val ts = Seq.fill(n) {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
  }.sorted
  ts(n / 2)
}

val dirs = Seq(0.001 -> "/root/testdata/sf0.001", 0.01 -> "/root/testdata/sf0.01",
  0.1 -> "/root/testdata/sf0.1")

// (query, bare variant, full query). Bare = same projection, same scan,
// plus the query's structural exchange where it has one, with a trivial
// aggregate replacing the query's own operator.
val cases = Seq[(String, String => org.apache.spark.sql.DataFrame, String => org.apache.spark.sql.DataFrame)](
  // q2: both fact scans + a count — the 4-way join chain is the delta
  ("q2", d => {
    Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice", "l_discount").
      agg(count(lit(1)), Relational.dsum(col("l_extendedprice"), 2)).
      crossJoin(Tables.orders(spark, d).select("o_orderkey", "o_custkey").agg(count(lit(1))))
  }, d => Relational.q2(spark, d)),
  // q3: fact scan + same aggregate — the broadcast probe + band is the delta
  ("q3", d => {
    Tables.lineitem(spark, d).select("l_orderkey", "l_shipdate", "l_extendedprice").
      agg(count(lit(1)).as("c"),
        round(Relational.fsum(col("l_extendedprice")) / count(lit(1)), 2).as("ap"))
  }, d => Relational.q3(spark, d)),
  // q4: both scans + the distinct's o_custkey exchange with plain counts —
  // the left-outer membership probe is the delta (verdict mixed
  // floor/2.6: the decomposition says which)
  ("q4", d => {
    Tables.customer(spark, d).select("c_custkey").agg(count(lit(1))).
      crossJoin(Tables.orders(spark, d).select("o_custkey").distinct().agg(count(lit(1))))
  }, d => Relational.q4(spark, d)),
  // q5: scan + the o_custkey grouping exchange with a plain count — the
  // heap aggregate + posexplode is the delta
  ("q5", d => {
    Tables.orders(spark, d).select("o_custkey", "o_orderkey", "o_totalprice").
      groupBy("o_custkey").agg(count(lit(1)).as("n")).
      orderBy(col("o_custkey")).limit(100)
  }, d => Relational.q5(spark, d)),
  // q6: same 3-col scan with a plain max — the per-partition top-k heap
  // + driver k-merge is the delta
  ("q6", d => {
    Tables.lineitem(spark, d).select("l_orderkey", "l_linenumber", "l_extendedprice").
      agg(max(col("l_extendedprice")))
  }, d => Relational.q6(spark, d)),
  // q12: scan + the user_id grouping exchange with a plain count — the
  // interval-merge session aggregate is the delta
  ("q12", d => {
    Tables.events(spark, d).select("user_id", "ts").
      groupBy("user_id").agg(count(lit(1)).as("n")).agg(sum("n"))
  }, d => Events.q12(spark, d)),
  // q13: scan + user_id exchange + per-user max — the per-partition sort
  // + WindowExec lag machinery is the delta
  ("q13", d => {
    Tables.events(spark, d).select("event_type", "user_id", "ts", "event_id").
      groupBy("user_id").agg(max(col("ts")).as("m")).agg(count(lit(1)))
  }, d => Events.q13(spark, d)))

Seq.fill(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())
val floor0 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

for ((_, b, f) <- cases; (_, d) <- dirs) { b(d).collect(); b(d).collect(); b(d).collect(); f(d).collect(); f(d).collect(); f(d).collect() }
val meas: Seq[(String, String, Double, Double)] = dirs.flatMap { case (sf, d) =>
  cases.flatMap { case (name, b, f) =>
    Seq((name, "bare", sf, med(7)(b(d).collect())), (name, "full", sf, med(7)(f(d).collect())))
  }
}
val floor1 = med(5)(Tables.region(spark, "/root/testdata/sf0.1").groupBy().count().collect())

def fit(pts: Seq[(Double, Double)]): (Double, Double) = {
  val n = pts.size
  val xm = pts.map(_._1).sum / n; val ym = pts.map(_._2).sum / n
  val sxx = pts.map(p => (p._1 - xm) * (p._1 - xm)).sum
  val m = pts.map(p => (p._1 - xm) * (p._2 - ym)).sum / sxx
  val a = ym - m * xm
  val resid = pts.map(p => math.abs(p._2 - (a + m * p._1))).max
  (m, resid)
}
val rows = cases.map { case (name, _, _) =>
  def side(v: String) = {
    val pts = meas.collect { case (`name`, `v`, sf, t) => (sf, t) }
    val (m, r) = fit(pts)
    val ptsJson = pts.map { case (sf, t) => f"""{"sf":$sf,"e":$t%.4f}""" }.mkString("[", ",", "]")
    (m, f""""$v":{"points":$ptsJson,"m":$m%.4f,"resid":$r%.4f}""")
  }
  val (mB, jB) = side("bare")
  val (mF, jF) = side("full")
  val share = if (mF > 0) mB / mF else Double.NaN
  f""""$name":{$jB,$jF,"op_marginal":${mF - mB}%.4f,"bare_share_of_full":$share%.3f}"""
}
val json = f"""{"metric":"weak_decomposition","floor_start_sec":$floor0%.4f,"floor_end_sec":$floor1%.4f,${rows.mkString(",")}}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_weak_decomp_latest.json"), json + "\n")
println(json)
println("DECOMP_DONE")
