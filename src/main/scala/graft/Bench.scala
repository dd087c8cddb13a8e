package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — mirrors the BASELINE.md protocol: per query, one
  * warm-up execution then median of 3 timed runs, each with a full result
  * fetch (collect) to the driver. Emits ONE JSON line for the driver.
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

    // Session warm-up (JIT, codegen cache, FS metadata): one throwaway run.
    // Guarded: a warm-up failure must not prevent the JSON line (each query
    // is also individually guarded below and reported as -1).
    try SparkEntry.queries("q1_pricing_agg")(spark, sfDir).collect()
    catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val results: Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t = try {
          timeOnce(fn) // warm-up for this query's plan
          val samples = Seq.fill(3)(timeOnce(fn)).sorted
          samples(1) // median
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
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total_median_sec","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
