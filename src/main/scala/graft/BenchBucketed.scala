package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pay-once bucketed-layout bench for q2 (r9 verdict item 5): records the
  * deployment-scale answer to q2's three-stage broadcast chain as numbers,
  * not just the BucketedJoinSpec plan shape.
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
    * session (shuffled vs co-located) rather than by a broadcast.
    */
  private def q2FactJoin(li: DataFrame, o: DataFrame, spark: SparkSession,
      dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val asiaCust = broadcast(c
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name")))
    val asiaOrders = o.select("o_orderkey", "o_custkey")
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"))
    li.select("l_orderkey", "l_extendedprice", "l_discount")
      .join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(queries.Relational.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("rev"))
      .orderBy(col("rev").desc, col("n_name"))
  }

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

      // pay-once staging: fact tables bucketed on the join key
      spark.sql("DROP TABLE IF EXISTS g_li_bkt")
      spark.sql("DROP TABLE IF EXISTS g_o_bkt")
      val tStage = {
        val t = System.nanoTime()
        Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .write.bucketBy(cpus.toInt, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable("g_li_bkt")
        Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey")
          .write.bucketBy(cpus.toInt, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable("g_o_bkt")
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
      val factExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey")))
      require(factExchanges == 0,
        s"bucketed q2 re-shuffled the fact side ($factExchanges exchanges):\n$plan")
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
      val cells = Pipeline.ivfadcProbedCells(queriesDf, cents, nprobe = 4)
      def stagedQ() = Pipeline.ivfadcStagedProbe(
        spark, codesPath, emb, queriesDf, cents, cb, nprobe = 4, rerank = 50)
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

      val floor1 = med(3)(Tables.region(spark, sfDir).groupBy().count().collect())
      def n(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      val json =
        s"""{"metric":"q2_bucketed_layout","sf":"$sfDir","buckets":$cpus,""" +
        s""""q2_broadcast_sec":${n(tBroadcast)},"q2_shuffle_smj_sec":${n(tShuffle)},""" +
        s""""q2_bucketed_smj_sec":${n(tBucketed)},"stage_once_sec":${n(tStage)},""" +
        s""""fact_exchanges_bucketed":$factExchanges,""" +
        s""""ivfadc_inline_q88_sec":${n(tAnnInline)},""" +
        s""""ivfadc_stage_once_sec":${n(tAnnStage)},""" +
        s""""ivfadc_staged_probe_sec":${n(tAnnStaged)},""" +
        s""""ivfadc_cells_probed":${cells.length},"ivfadc_codes_exchanges":$codesExchanges,""" +
        s""""floor_start_sec":${n(floor0)},"floor_end_sec":${n(floor1)}}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("tools"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("tools/bench_bucketed_latest.json"), json + "\n")
      println(json)
    } finally {
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_li_bkt"))
      scala.util.Try(spark.sql("DROP TABLE IF EXISTS g_o_bkt"))
      spark.stop()
    }
  }
}
