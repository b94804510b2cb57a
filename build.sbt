ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkandacyclicschemaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// r13 suite-wall-time: run suites on a thread pool inside the forked
// JVM (they share one SparkTestSession — Spark schedulers are
// thread-safe, fixture temp views bind identical content, and the
// streaming sinks carry per-entry names). Sequential was 20m46s with
// the TWS/streaming suites dominating; parallel overlaps their
// processAllAvailable waits with CPU-bound suites.
Test / testForkedParallel := true
run / fork := true
// Pass the forked runMain's stdout through RAW (no "[info] " log-prefix):
// the bench driver machine-parses the final JSON line of stdout, and the
// default LoggedOutput decoration made that line unparseable (BENCH_r10's
// `parsed: null`).
run / outputStrategy := Some(StdoutOutput)
// ... and suppress the trailing "[success] Total time" line so the JSON
// really is the LAST stdout line a tail-capture sees.
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark whole-stage codegen emits one compiled class per plan shape;
  // a bench/verify JVM runs hundreds of distinct shapes, which can
  // exhaust HotSpot's 240m default and trigger code-cache FLUSHING
  // (methods then re-run interpreted). Headroom removes that failure
  // mode from the harness; the residual heavy-entry warm-up that
  // remains after this bump is driver-side Catalyst planning of the
  // multi-plan FULL OUTER views (profiled standalone), which the
  // bench's per-query `min` already floors.
  "-XX:ReservedCodeCacheSize=512m",
)
