package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN knob sweep — recall@5 vs engine seconds, measured, per family.
  *
  * The spec checks (SpecChecks.scala) pin each ANN family at ONE
  * operating point (q29/q38/q86/q88) plus its exhaustive-mode == exact
  * identity. This main records the CURVE those points sit on: for IVF
  * (q38's shape) and IVFADC (q88's shape), recall@5 against the exact
  * brute-force q16 ground truth and the median engine time, as the
  * probe/rerank knobs move — so a deployment can pick its point from a
  * measured tradeoff instead of prose. The staged cell-partitioned
  * IVFADC layout (BenchBucketed's deployment story) is swept too: its
  * probe cost SCALES WITH nprobe because partition pruning bounds the
  * scan to the probed cells' files — the sub-linear-read claim, shown
  * as a curve rather than one number.
  *
  * Output: one JSON line + tools/bench_ann_sweep.json, same artifact
  * discipline as the other bench mains (floor probes at both ends; a
  * degraded window shows itself in the floors).
  */
object BenchAnnSweep {

  private def med(n: Int)(f: => Unit): Double = {
    val ts = Seq.fill(n) {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }.sorted
    ts(n / 2)
  }

  private def n(d: Double): String = f"$d%.4f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-ann-sweep"
      else java.nio.file.Files.createTempDirectory("graft-ann").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalogImplementation", "in-memory")
      .config("spark.local.dir", scratch)
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import queries.{Pipeline, TextVec}
    try {
      Seq.fill(5)(Tables.region(spark, sfDir).groupBy().count().collect())
      val floor0 = med(3)(Tables.region(spark, sfDir).groupBy().count().collect())

      // exact ground truth (q16 brute force) — the recall denominator
      TextVec.q16(spark, sfDir).collect()
      val tExact = med(3)(TextVec.q16(spark, sfDir).collect())
      val exactTop5 = TextVec.q16(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      def recallOf(df: DataFrame): Double = {
        val ann = df.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exactTop5 & ann).size.toDouble / exactTop5.size
      }

      // IVF (q38's shape): probe nprobe of 16 trained cells, exact rank.
      // Timing includes the in-query k-means training — the shipping
      // query's cost, constant across the sweep; the point-to-point
      // MARGINAL is the probe+rank term.
      val ivfPoints = Seq(1, 2, 4, 8, 16).map { np =>
        Pipeline.ivfAnn(spark, sfDir, nprobe = np).collect()
        val t = med(3)(Pipeline.ivfAnn(spark, sfDir, nprobe = np).collect())
        val rec = recallOf(Pipeline.ivfAnn(spark, sfDir, nprobe = np))
        System.err.println(f"[ann-sweep] ivf nprobe=$np%2d recall=$rec%.2f t=$t%.3f")
        s"""{"nprobe":$np,"recall":${n(rec)},"sec":${n(t)}}"""
      }

      // PQ (q86's shape): ADC shortlist of `rerank`, exact re-rank.
      val pqPoints = Seq(10, 25, 50, 200).map { rr =>
        Pipeline.pqAnn(spark, sfDir, rerank = rr).collect()
        val t = med(3)(Pipeline.pqAnn(spark, sfDir, rerank = rr).collect())
        val rec = recallOf(Pipeline.pqAnn(spark, sfDir, rerank = rr))
        System.err.println(f"[ann-sweep] pq rerank=$rr%4d recall=$rec%.2f t=$t%.3f")
        s"""{"rerank":$rr,"recall":${n(rec)},"sec":${n(t)}}"""
      }

      // IVFADC inline (q88's shape): both knobs, one axis at a time.
      val ivfadcNp = Seq(1, 2, 4, 8, 16).map { np =>
        Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = 50).collect()
        val t = med(3)(Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = 50).collect())
        val rec = recallOf(Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = 50))
        System.err.println(f"[ann-sweep] ivfadc nprobe=$np%2d recall=$rec%.2f t=$t%.3f")
        s"""{"nprobe":$np,"rerank":50,"recall":${n(rec)},"sec":${n(t)}}"""
      }

      // IVFADC rerank axis (nprobe=4) + both-knobs-up points: the nprobe
      // axis above plateaus at ~0.54, so THIS is the binding knob.
      val ivfadcRr = (Seq((4, 100), (4, 200), (4, 400), (8, 200), (8, 400),
        (8, 800), (16, 200))).map {
        case (np, rr) =>
          Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = rr).collect()
          val t = med(3)(Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = rr).collect())
          val rec = recallOf(Pipeline.ivfadcAnn(spark, sfDir, nprobe = np, rerank = rr))
          System.err.println(
            f"[ann-sweep] ivfadc nprobe=$np%2d rerank=$rr%4d recall=$rec%.2f t=$t%.3f")
          s"""{"nprobe":$np,"rerank":$rr,"recall":${n(rec)},"sec":${n(t)}}"""
      }

      // IVFADC staged probe: index written ONCE partitioned by cell; each
      // probe reads only its nprobe cells' files. cells_probed is recorded
      // so the pruning claim is checkable against the time curve.
      val emb = Tables.embeddings(spark, sfDir)
        .withColumn("nrm", graft.expressions.TextVecExprs.floatVecNorm(col("embedding")))
      val codesPath = s"$scratch/ivfadc_codes"
      val tStage = {
        val t = System.nanoTime()
        val cents = Pipeline.ivfTrain(emb)
        val cb = Pipeline.pqTrain(emb)
        Pipeline.ivfadcIndex(emb, cents, cb)
          .write.partitionBy("bkt").mode("overwrite").parquet(codesPath)
        (System.nanoTime() - t) / 1e9
      }
      val cents = Pipeline.ivfTrain(emb)
      val cb = Pipeline.pqTrain(emb)
      val queriesDf = Pipeline.annQueries(emb)
      val stagedPoints = Seq(1, 2, 4, 8, 16).map { np =>
        def q() = Pipeline.ivfadcStagedProbe(
          spark, codesPath, emb, queriesDf, cents, cb, nprobe = np, rerank = 50)
        val cells = Pipeline.ivfadcProbedCells(queriesDf, cents, np).length
        q().collect()
        val t = med(3)(q().collect())
        val rec = recallOf(q())
        System.err.println(
          f"[ann-sweep] staged nprobe=$np%2d cells=$cells%2d recall=$rec%.2f t=$t%.3f")
        s"""{"nprobe":$np,"rerank":50,"cells_probed":$cells,"recall":${n(rec)},"sec":${n(t)}}"""
      }

      val floor1 = med(3)(Tables.region(spark, sfDir).groupBy().count().collect())
      val json =
        s"""{"metric":"ann_recall_cost_sweep","sf":"$sfDir","k":5,""" +
          s""""exact_q16_sec":${n(tExact)},""" +
          s""""ivf":[${ivfPoints.mkString(",")}],""" +
          s""""pq":[${pqPoints.mkString(",")}],""" +
          s""""ivfadc_inline":[${ivfadcNp.mkString(",")}],""" +
          s""""ivfadc_rerank_axis":[${ivfadcRr.mkString(",")}],""" +
          s""""ivfadc_stage_once_sec":${n(tStage)},""" +
          s""""ivfadc_staged":[${stagedPoints.mkString(",")}],""" +
          s""""floor_start_sec":${n(floor0)},"floor_end_sec":${n(floor1)}}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("tools"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("tools/bench_ann_sweep.json"), json + "\n")
      println(json)
    } finally {
      spark.stop()
    }
  }
}
