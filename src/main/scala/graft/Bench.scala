package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — mirrors the BASELINE.md protocol: per query, warm-up
  * executions then the median of 5 timed runs, each with a full result
  * fetch (collect) to the driver. Emits ONE JSON line for the driver.
  *
  * Reproducibility (round-2 verdict: driver runs showed 5–15× outliers vs
  * clean runs — JIT/codegen/GC churn in a fresh JVM):
  *  - a GLOBAL warm pass executes every query once before any timing, so
  *    JIT compilation, codegen caching, and parquet footer/metadata reads
  *    are paid up front rather than inside someone's timed run;
  *  - median of 5 (not 3) absorbs a stray GC pause;
  *  - GC time per query is measured and logged to stderr so an anomalous
  *    number is diagnosable from the run log.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // Global warm pass: run EVERY query once (guarded — a warm-up failure
    // must not prevent the JSON line; failing queries are reported -1 below).
    val tWarm0 = System.nanoTime()
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).collect()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}") }
    }
    System.err.println(f"[bench] global warm pass: ${(System.nanoTime() - tWarm0) / 1e9}%.1f s")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val results: Seq[(String, Double)] = ordered.map { case (name, fn) =>
      val t = try {
        timeOnce(fn) // per-query re-warm right before its timed runs
        val gc0 = gcMillis()
        val samples = Seq.fill(5)(timeOnce(fn)).sorted
        val gcMs = gcMillis() - gc0
        if (gcMs > 200 || samples.last > 2 * samples.head)
          System.err.println(f"[bench] $name samples=${samples.map(s => f"$s%.3f").mkString(",")} gc=${gcMs}ms")
        samples(2) // median of 5
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      name -> t
    }

    // Locale.ROOT formatting: the f-interpolator uses the default locale,
    // which on comma-decimal locales would emit invalid JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val failures = results.count(_._2 < 0)
    // failed queries are excluded from the sum but flagged explicitly:
    // a query that starts erroring must never make the total look faster
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total_median_sec","value":${num(total)},"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
