ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "biggiespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Driver bench-parse contract (r19 verdict item 2, standing since r1): the
// driver invokes `sbt "runMain graft.Bench"` and parses the LAST stdout line
// as JSON. With the default LoggedOutput strategy every forked-process line
// arrives prefixed "[info] " and sbt appends a "[success] Total time..."
// line after it — so the headline JSON was never a bare final line and
// parsed:null in all 19 BENCH artifacts. StdoutOutput makes the forked JVM
// inherit sbt's own stdout/stderr (bench lines print bare), and
// showSuccess=false drops the trailing success line, so the compact JSON is
// the final bare stdout line on a clean (rc 0) run. Reporting-path only —
// nothing inside any timed region changes.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g: local[32] at sf0.1 in an 8g heap spent measurable time in GC
  // during benches; the machine has 125g. -Xms pre-sizes the heap so
  // growth stalls never land inside a timed run. When the user overrides
  // SPARK_DRIVER_MEM, -Xms follows it (Xms = Xmx) unless explicitly set —
  // a fixed 8g init against e.g. SPARK_DRIVER_MEM=4g would refuse to boot.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.get("SPARK_DRIVER_MEM_INIT")
    .orElse(sys.env.get("SPARK_DRIVER_MEM")).getOrElse("8g")}",
)
