ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataingestionplaygroundspark"
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
  // The bench/verify box has 128 GiB; local[32] runs 32 concurrent tasks
  // in ONE JVM, so an 8g heap turns every wide shuffle into GC churn +
  // block-manager eviction (measured: same query 2.7s vs 19.2s across
  // warm reps at 8g; stable at 48g). Size the heap like an executor
  // fleet's worth of memory, since that is what local[32] emulates.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseG1GC",
  // Spark's ContextCleaner periodicGC calls System.gc(); by default that
  // is a stop-the-world FULL GC — multi-second on a 48g heap, landing on
  // whichever query is running when the 30s timer fires (measured: the
  // same query 1.5s isolated vs 15.6s mid-suite). Concurrent-cycle it.
  "-XX:+ExplicitGCInvokesConcurrent",
  // 97 queries x whole-stage codegen blows through the 240m default code
  // cache; when it fills, the JIT disables itself and late queries run
  // interpreted (random 5-10x spikes that move between runs).
  "-XX:ReservedCodeCacheSize=1g",
)

run / connectInput := true

// The driver parses the LAST stdout line of the bench step as JSON.
// sbt normally appends "[success] Total time: ..." after the forked
// main's output, which has left BENCH_r{17,18}.json with parsed:null.
// Suppress the trailer so graft.Bench's compact JSON line is literally
// the last thing on stdout under any `sbt ... run/runMain` invocation,
// and forward the forked JVM's stdout RAW (no "[info] " logger prefix)
// so that line is bare JSON, parseable without stripping.
// (target/bench_last.json remains the capture-independent pickup path.)
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's command layer, not another setting —
// exclude it from the unused-key lint so the suppression stays warn-free.
Global / excludeLintKeys += showSuccess
