ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "weatherdatapipelinesvspark"
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
// The bench driver parses the LAST stdout line as the summary JSON.
// sbt's "[success] Total time: ..." trailer prints after the forked
// program's output and has made BENCH_r01..r05 unparseable — suppress it
// (both scopes: sbt consults the current project's setting, Global is belt).
Global / showSuccess := false
showSuccess := false
// lintUnused can't see command-engine keys — false positive, silence it
Global / excludeLintKeys += showSuccess
// ... and un-prefix the forked program's output: the default LoggedOutput
// strategy wraps every stdout line in "[info] ", which would still defeat
// a strict last-line JSON parse. StdoutOutput inherits the real stdio.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Throughput collector for the forked driver JVMs: this is a batch
  // workload on a moderate (8g) heap where pause time is irrelevant
  // and allocation rate is the cost — A/B on a quiet box (full warm
  // bench, same tree): G1 153.5 s / ParallelGC 126.6 s (gc_sec 81.8
  // vs 70.4; OPTIMIZATION_r16.md §7). Env-overridable; heap-size A/B
  // in the same section showed 16g is NOT better (gc is allocation-
  // rate-bound, not heap-bound), so the default stays 8g.
  s"-XX:+Use${sys.env.getOrElse("SPARK_DRIVER_GC", "ParallelGC")}",
)
