ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "forecastframespark"
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
// pass the forked process's stdout through UN-prefixed: the driver parses
// graft.Bench's JSON line from stdout, and sbt's default LoggedOutput wraps
// every line in "[info] ", which broke that parse in rounds 1-2
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own "[success] Total time ..." trailer, which was
// the LAST line of stdout after Bench's JSON whenever the driver invoked
// sbt directly instead of tools/bench.sh (the r1-r5 null-parse cause).
// With both settings, Bench's println(json) is the final stdout line of
// the whole `sbt -batch "runMain graft.Bench"` process. Exit codes and
// BENCH_OUT.json are unaffected.
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
  // Pin the JVM default timezone too: entry fold boundaries built with
  // java.sql.Timestamp.valueOf(...) parse in the JVM default zone, while
  // their DuckDB oracle twins pin UTC epochs — identical only when the
  // JVM default is UTC (r5 review finding; this box is UTC, a laptop may
  // not be).
  "-Duser.timezone=UTC",
  // 24g default: local[32] aggregation holds per-task hash maps + codec
  // buffers; 8g measurably GC-thrashes at 32 threads (box has 128 GiB).
  // -Xms presizes the heap to -Xmx: without it the FIRST job in a fresh JVM
  // full-GCs its way from the tiny default heap up to the max (measured:
  // 454 s first-run tier-1 with 248 s of GC on a growing heap vs 76 s
  // steady-state) — which is exactly the state a driver-launched bench JVM
  // is in.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ParallelGC: the tier cascade is allocation-heavy (point buffers, codec
  // arrays, shuffle rows); A/B on the 32M-page cascade at local[8] measured
  // median 50s (Parallel) vs 80s (G1) with far tighter variance — G1's
  // concurrent cycles compete with the worker threads for cores.
  sys.env.getOrElse("SPARK_GC_OPT", "-XX:+UseParallelGC"),
)
