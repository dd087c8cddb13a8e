// Dispatch-floor decomposition of the kernel finale (r16 verdict item 3):
// r15 measured the q9a kernel's post-memo remainder as ~35 ms = aggregate
// job launch + one-row result collect. Two candidate levers, measured
// here head-to-head at sf0.1, warm, all variants back-to-back in one
// session so a drag window hits everything roughly equally:
//
//   full       — q9aColumnarKernel as shipped (treeAggregate depth=2:
//                TWO stages — partition folds + one tree-merge shuffle —
//                then createDataFrame(asJava) + collect)
//   runjob     — the same fold as ONE stage: sc.runJob collecting the 32
//                per-partition id sets, driver merge (gated regime only:
//                this is the withinBroadcastBound branch), then the same
//                result-frame materialization
//   job_only   — runjob variant WITHOUT result-frame materialization
//                (isolates the finale frame's cost)
//   frame_cdf  — spark.createDataFrame(Seq(Row(1L)).asJava, schema)
//                .collect() alone (plan + convert + execute LocalRelation)
//   frame_lr   — GraftColumnBridge.localResult(...).collect() alone
//                (LocalRelation built directly from InternalRow values)
//
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/dispatch_decomp.scala <<< ""
// Writes tools/bench_dispatch_decomp_latest.json.
{
  import graft.Tables
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  import scala.jdk.CollectionConverters._

  val dir = "/root/testdata/sf0.1"
  def med(n: Int)(f: => Unit): Double = {
    val ts = Seq.fill(n) { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }.sorted
    ts(n / 2)
  }

  Seq.fill(5)(Tables.region(spark, dir).groupBy().count().collect())
  val floor0 = med(5)(Tables.region(spark, dir).groupBy().count().collect())

  // shipped kernel (within-bound branch: treeAggregate depth=2)
  def full(): Unit = { graft.queries.Events.q9aColumnarKernel(spark, dir).collect(); () }

  // the same input frame the kernel scans (same memo tag → same plan)
  val ev = graft.operators.ColumnarScan.inputCached(spark, dir, "q9aKernelInput") {
    Tables.events(spark, dir).select(col("user_id"))
  }
  val (batches, schema) = graft.operators.ColumnarScan.batches(ev)
  val uIdx = schema.fieldIndex("user_id")
  val isLong = schema(uIdx).dataType == LongType

  val partials = batches.mapPartitions { it =>
    val set = new graft.operators.LongAccMap(1)
    while (it.hasNext) {
      val b = it.next()
      val n = b.numRows()
      val v = b.column(uIdx)
      val anyNull = v.hasNull
      var i = 0
      while (i < n) {
        if (!(anyNull && v.isNullAt(i)))
          set.slot(if (isLong) v.getLong(i) else v.getInt(i).toLong)
        i += 1
      }
    }
    Iterator.single(set)
  }
  val outSchema = StructType(Seq(StructField("du", LongType, nullable = false)))

  def jobOnly(): Long = {
    val sets = spark.sparkContext.runJob(partials, (it: Iterator[graft.operators.LongAccMap]) => it.next())
    val acc = sets.maxBy(_.size)
    sets.foreach { s => if (!(s eq acc)) s.foreachEntry((k, _) => { acc.slot(k); () }) }
    acc.size.toLong
  }
  def runjob(): Unit = {
    val du = jobOnly()
    spark.createDataFrame(Seq(Row(du)).asJava, outSchema).collect(); ()
  }
  def frameCdf(): Unit = {
    spark.createDataFrame(Seq(Row(1L)).asJava, outSchema).collect(); ()
  }
  def frameLr(): Unit = {
    org.apache.spark.sql.GraftColumnBridge
      .localResult(spark, outSchema, Seq(Array[Any](1L))).collect(); ()
  }

  // correctness pin before timing: all paths agree
  val duKernel = graft.queries.Events.q9aColumnarKernel(spark, dir).collect()(0).getLong(0)
  val duRun = jobOnly()
  assert(duKernel == duRun, s"runJob merge diverged: $duKernel vs $duRun")

  val variants = Seq[(String, () => Unit)](
    ("full", () => full()), ("runjob", () => runjob()),
    ("job_only", () => { jobOnly(); () }),
    ("frame_cdf", () => frameCdf()), ("frame_lr", () => frameLr()))
  for ((_, f) <- variants; _ <- 1 to 3) f()  // warm
  val meas = variants.map { case (name, f) => name -> med(9)(f()) }

  val floor1 = med(5)(Tables.region(spark, dir).groupBy().count().collect())
  val body = meas.map { case (n, t) => f""""$n":$t%.4f""" }.mkString(",")
  val json = f"""{"metric":"dispatch_decomposition","floor_start_sec":$floor0%.4f,"floor_end_sec":$floor1%.4f,$body,"du":$duKernel}"""
  java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/tools/bench_dispatch_decomp_latest.json"), json + "\n")
  println(json)
  println("DECOMP_DONE")
}
