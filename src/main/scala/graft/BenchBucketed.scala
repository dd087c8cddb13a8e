package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pay-once bucketed-layout bench (r9 item 5, r10 item 3, r11 items 1/4/6):
  * records the deployment-scale answer to the repeated-analytics story as
  * numbers, not just BucketedJoinSpec plan shapes — q2's fact join, the
  * IVFADC cell-partitioned index, the user_id events family
  * (q12/q13/q21/q51/q70/q71 over a bucketed+ts-sorted events table), and
  * q5 over custkey-bucketed orders.
  *
  * Three regimes over the same data, one session:
  *  - `broadcast`: the shipping q2 (stats-gated plan-time broadcast chain)
  *    — optimal while the reduced orders side fits a broadcast; at 100 TB
  *    it does not.
  *  - `shuffle`: broadcast disabled for the fact join (dims still hinted)
  *    — the default 100 TB plan without layout work: both fact sides
  *    exchange on the orderkey every query.
  *  - `bucketed`: lineitem and orders pre-bucketed on the orderkey
  *    (bucketBy 32 + sortBy, staged ONCE — the cost is reported too), fact
  *    join runs as a co-located SortMergeJoin with ZERO fact-side
  *    exchange; the customer→nation→region reduction rides explicit
  *    broadcast hints so the orders scan's bucketing survives to the join.
  *
  * Emits one JSON line and tools/bench_bucketed_latest.json. The plan
  * shape of the bucketed regime is asserted (no hashpartitioning exchange
  * on the fact side) so the number can't silently measure the wrong plan.
  */
object BenchBucketed {

  private def med(n: Int)(f: => Unit): Double = {
    val ts = Seq.fill(n) {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }.sorted
    ts(n / 2)
  }

  /** q2 with an explicitly-broadcast customer chain and NO hint on the
    * fact join — the shape whose fact-join physicality is decided by the
    * session (shuffled vs co-located) rather than by a broadcast. Now the
    * public `Relational.q2FromFacts` (the q98 driver entry); the bench
    * times what a user would call.
    */
  private def q2FactJoin(li: DataFrame, o: DataFrame, spark: SparkSession,
      dir: String): DataFrame =
    queries.Relational.q2FromFacts(li, o, spark, dir)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bucketed-bench"
      else java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalogImplementation", "in-memory")
      .config("spark.local.dir", scratch)
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm the floor path first — a fresh JVM's C2 ramp otherwise reads
      // as host drag (the Bench.floorProbe lesson, r11)
      Seq.fill(5)(Tables.region(spark, sfDir).groupBy().count().collect())
      val floor0 = med(3)(Tables.region(spark, sfDir).groupBy().count().collect())

      // shipping q2 (broadcast chain), warmed then median-of-5
      queries.Relational.q2(spark, sfDir).collect()
      val tBroadcast = med(5)(queries.Relational.q2(spark, sfDir).collect())

      // pay-once staging: fact tables bucketed on the join key (the
      // public Layouts API — the bench measures what a user would stage)
      val tStage = {
        val t = System.nanoTime()
        Layouts.stageFactsByOrderkey(spark, sfDir, cpus.toInt)
        (System.nanoTime() - t) / 1e9
      }

      // 100 TB stand-in: the fact join may not broadcast. Each timed run
      // REBUILDS the DataFrame — re-collecting one Dataset instance lets
      // AQE reuse its already-materialized shuffle stages and reports a
      // number with the data-proportional work skipped (observed: 0.04 s
      // "q2" — faster than the dispatch floor).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def shuffleQ() = q2FactJoin(
        Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), spark, sfDir)
      shuffleQ().collect()
      val tShuffle = med(5)(shuffleQ().collect())

      def bucketQ() = q2FactJoin(
        spark.table("g_li_bkt"), spark.table("g_o_bkt"), spark, sfDir)
      // plan gate: the fact side must not re-exchange — otherwise this
      // reports a number for the wrong plan
      val gateQ = bucketQ()
      gateQ.collect()
      val plan = gateQ.queryExecution.executedPlan.toString
      val factViol = queries.Relational.orderkeyLayoutGateViolations(plan)
      require(factViol.isEmpty,
        s"bucketed q2: ${factViol.mkString("; ")}\n$plan")
      val factExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey")))
      val tBucketed = med(5)(bucketQ().collect())

      // ---- IVFADC staged-layout section (r10 verdict item 3) ----
      // The deployment claim q88 carries in prose — "IVF cells bound scan
      // extent, PQ codes bound bandwidth, cell-partitioned codes are the
      // 100 TB layout" — measured the q2 way. Inline = the shipping q88
      // (trains quantizers + encodes codes INSIDE the query, deliberate for
      // oracle determinism). Staged = pay-once: train, encode, write the
      // (vec_id, bkt, codes) index partitioned by cell; a probe then reads
      // ONLY its nprobe cells' files (partition pruning gated below) and
      // the codes side never exchanges (gated below).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      import queries.Pipeline
      val emb = Tables.embeddings(spark, sfDir)
        .withColumn("nrm", graft.expressions.TextVecExprs.floatVecNorm(col("embedding")))
      Pipeline.q88(spark, sfDir).collect()
      val tAnnInline = med(3)(Pipeline.q88(spark, sfDir).collect())
      val codesPath = s"$scratch/ivfadc_codes"
      var cents: Array[Array[Double]] = null
      var cb: Array[Array[Array[Double]]] = null
      val tAnnStage = {
        val t = System.nanoTime()
        cents = Pipeline.ivfTrain(emb)
        cb = Pipeline.pqTrain(emb)
        Pipeline.ivfadcIndex(emb, cents, cb)
          .write.partitionBy("bkt").mode("overwrite").parquet(codesPath)
        (System.nanoTime() - t) / 1e9
      }
      val queriesDf = Pipeline.annQueries(emb)
      // q88's OWN operating point (Pipeline.AnnNprobe/AnnRerank): the
      // staged-vs-inline parity gate below is only meaningful at the same
      // (nprobe, rerank) — r17 found this pinned to the pre-r14 (4, 200),
      // so the require had failed on every run since q88's default moved
      val cells = Pipeline.ivfadcProbedCells(queriesDf, cents, Pipeline.AnnNprobe)
      def stagedQ() = Pipeline.ivfadcStagedProbe(
        spark, codesPath, emb, queriesDf, cents, cb,
        Pipeline.AnnNprobe, Pipeline.AnnRerank)
      // result parity: staged layout must reproduce the inline q88 rows
      val inlineRows = Pipeline.q88(spark, sfDir).collect().toSeq
      val stagedRows = stagedQ().collect().toSeq
      require(inlineRows == stagedRows,
        s"staged IVFADC diverged from inline q88: ${stagedRows.size} vs ${inlineRows.size} rows")
      // plan gates (shared with BucketedJoinSpec): codes side never
      // exchanges; scan is partition-pruned
      val gateAnn = stagedQ()
      gateAnn.collect()
      val annPlan = gateAnn.queryExecution.executedPlan.toString
      val violations = Pipeline.ivfadcCodesGateViolations(annPlan)
      require(violations.isEmpty,
        s"staged IVFADC plan violations: ${violations.mkString("; ")}\n$annPlan")
      // counted from the executed plan, not asserted-then-hardcoded (r11
      // advice): the artifact must reflect what actually ran
      val codesExchanges = annPlan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("codes") || l.contains("bkt") || l.contains("embedding")))
      val tAnnStaged = med(5)(stagedQ().collect())

      // ---- pay-once events layout (r11 verdict item 1) ----
      // The q2/q88 treatment applied to where the weak list lives: events
      // bucketed by user_id AND sorted within buckets by (user_id, ts,
      // event_id) — the exact clustering+order every query in the
      // user_id family requires. The write is staged ONCE (cost reported);
      // each query then runs with ZERO user_id exchange and (where its
      // order requirement is a layout prefix) ZERO sort — the lag/session
      // family's documented sort-floor (Events.scala q13/q12 scaladoc,
      // two measured negatives in r10/r11) is pre-paid at write time.
      // staged via the public Layouts API (repartition-first → one file
      // per bucket → the scan reports its sort order; see Layouts scaladoc)
      val tEvStage = {
        val t = System.nanoTime()
        Layouts.stageEventsByUser(spark, sfDir, cpus.toInt)
        (System.nanoTime() - t) / 1e9
      }
      import queries.Events
      val evPlain = Tables.events(spark, sfDir)
      def evBkt = spark.table("g_ev_bkt")
      // q70's window runs over POST-distinct user-bounded rows whose scan
      // order the hash aggregate destroyed — its (cheap) sort is the right
      // plan, not a violation; see userIdLayoutGateViolations
      val family: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, Boolean)] = Seq(
        ("q12", Events.q12From, false),
        ("q13", Events.q13From, false),
        ("q21", Events.q21From, false),
        ("q51", Events.q51From, false),
        ("q70", Events.q70From, true),
        ("q71", Events.q71From, false))
      val evResults = family.map { case (name, q, allowSort) =>
        q(evPlain).collect()
        val tPlain = med(5)(q(evPlain).collect())
        // result parity first: the layout must change the plan, never the rows
        val gateQ = q(evBkt)
        val rowsB = gateQ.collect().toSeq
        val rowsP = q(evPlain).collect().toSeq
        require(rowsB == rowsP,
          s"bucketed events $name diverged: ${rowsB.size} vs ${rowsP.size} rows")
        val plan = gateQ.queryExecution.executedPlan.toString
        val viol = Events.userIdLayoutGateViolations(plan, allowSort)
        require(viol.isEmpty,
          s"bucketed events $name layout violations: ${viol.mkString("; ")}\n$plan")
        val tBkt = med(5)(q(evBkt).collect())
        (name, tPlain, tBkt)
      }
      // the family's last operator terms removed (r12): on the sorted
      // layout the lag/session machinery needs no WindowExec or hash agg
      // at all — single forward passes compute them (Events.q1*
      // FromSortedKernel). Parity-gated, then measured next to the
      // on-layout declarative numbers above; the decomposition run
      // recorded the q13 kernel == bare-scan cost at sf0.1 (0.176-0.180
      // vs 0.158-0.180 same-window blocks).
      val kernels: Seq[(String,
          org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
        ("q12", Events.q12From, Events.q12FromSortedKernel(_)),
        ("q13", Events.q13From, Events.q13FromSortedKernel),
        ("q21", Events.q21From, Events.q21FromSortedKernel),
        ("q51", Events.q51From, Events.q51FromSortedKernel),
        ("q70", Events.q70From, Events.q70FromSortedKernel),
        ("q71", Events.q71From, Events.q71FromSortedKernel))
      // the recorded kernel numbers are only meaningful on a BUCKET-ALIGNED
      // scan (BucketedJoinSpec gates the same shape): a planner-reverted
      // size-split scan would either trip the kernels' layout guards or,
      // worse, time a different physical read than the one documented
      val kernelScanPlan = evBkt.select(col("user_id"), col("ts"))
        .queryExecution.executedPlan.toString
      require(!kernelScanPlan.contains("Bucketed: false"),
        s"kernel-shaped scan lost bucket alignment:\n$kernelScanPlan")
      val kernelResults = kernels.map { case (name, declarative, kernel) =>
        require(kernel(evBkt).collect().toSeq == declarative(evPlain).collect().toSeq,
          s"$name sorted-layout kernel diverged from the declarative form")
        kernel(evBkt).collect()
        (name, med(5)(kernel(evBkt).collect()))
      }

      // ---- pay-once orders layout for q5 (r11 verdict item 6) ----
      // orders bucketed by o_custkey: the TopKPriceRows heap aggregation
      // plans as ONE exchange-free stage (complete-mode agg on the
      // co-located scan) instead of partial -> exchange -> final.
      val tQ5Stage = {
        val t = System.nanoTime()
        Layouts.stageOrdersByCustkey(spark, sfDir, cpus.toInt)
        (System.nanoTime() - t) / 1e9
      }
      queries.Relational.q5(spark, sfDir).collect()
      val tQ5Plain = med(5)(queries.Relational.q5(spark, sfDir).collect())
      def q5B() = queries.Relational.q5From(spark.table("g_ord_bkt"))
      val q5Gate = q5B()
      require(q5Gate.collect().toSeq == queries.Relational.q5(spark, sfDir).collect().toSeq,
        "bucketed q5 diverged from plain q5")
      val q5Plan = q5Gate.queryExecution.executedPlan.toString
      val q5Viol = queries.Relational.custkeyLayoutGateViolations(q5Plan)
      require(q5Viol.isEmpty,
        s"bucketed q5 layout violations: ${q5Viol.mkString("; ")}\n$q5Plan")
      val tQ5Bkt = med(5)(q5B().collect())

      val floor1 = med(3)(Tables.region(spark, sfDir).groupBy().count().collect())
      def n(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      // stage-once amortization: queries until the layout write pays for
      // itself vs the shipping plan (reported, not just prose — r11
      // verdict item 4)
      def amort(stage: Double, before: Double, after: Double): String =
        if (before > after) (stage / (before - after)).ceil.toLong.toString else "null"
      val evJson = evResults.map { case (name, p, b) =>
        s""""ev_${name}_plain_sec":${n(p)},"ev_${name}_bucketed_sec":${n(b)}""" }.mkString(",")
      val evSavedPerRun = evResults.map { case (_, p, b) => p - b }.sum
      val evAmort =
        if (evSavedPerRun > 0) (tEvStage / evSavedPerRun).ceil.toLong.toString else "null"
      val json =
        s"""{"metric":"q2_bucketed_layout","sf":"$sfDir","buckets":$cpus,""" +
        s""""q2_broadcast_sec":${n(tBroadcast)},"q2_shuffle_smj_sec":${n(tShuffle)},""" +
        s""""q2_bucketed_smj_sec":${n(tBucketed)},"stage_once_sec":${n(tStage)},""" +
        s""""q2_amortize_queries":${amort(tStage, tBroadcast, tBucketed)},""" +
        s""""fact_exchanges_bucketed":$factExchanges,""" +
        s""""ivfadc_inline_q88_sec":${n(tAnnInline)},""" +
        s""""ivfadc_stage_once_sec":${n(tAnnStage)},""" +
        s""""ivfadc_staged_probe_sec":${n(tAnnStaged)},""" +
        s""""ivfadc_cells_probed":${cells.length},"ivfadc_codes_exchanges":$codesExchanges,""" +
        s""""events_stage_once_sec":${n(tEvStage)},$evJson,""" +
        kernelResults.map { case (name, t) =>
          s""""ev_${name}_kernel_sec":${n(t)},""" }.mkString +
        s""""events_family_amortize_runs":$evAmort,""" +
        s""""q5_plain_sec":${n(tQ5Plain)},"q5_bucketed_sec":${n(tQ5Bkt)},""" +
        s""""q5_stage_once_sec":${n(tQ5Stage)},""" +
        s""""q5_amortize_queries":${amort(tQ5Stage, tQ5Plain, tQ5Bkt)},""" +
        s""""floor_start_sec":${n(floor0)},"floor_end_sec":${n(floor1)}}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("tools"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("tools/bench_bucketed_latest.json"), json + "\n")
      println(json)
    } finally {
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_li_bkt"))
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_o_bkt"))
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_ev_bkt"))
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_ord_bkt"))
      spark.stop()
    }
  }
}
