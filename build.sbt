ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vrodspark"
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
// Pass the forked program's stdout through RAW (no "[info] " prefix) and
// suppress sbt's trailing "[success] Total time" line: the driver's bench
// harness tail-captures ~2KB of output and parses the LAST line as JSON —
// sbt's log decoration defeated that parse every round through r11
// (BENCH_r11.json `parsed: null` with the intact line sitting in the tail).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 16g default: 8g gave local[32] only 256 MiB/core — far below any real
  // per-executor sizing — and measurably GC-throttled the hash-agg-heavy
  // bench queries (q100 2.58s@8g -> 1.66s@16g, q145 2.26 -> 2.05, same
  // box, same pass structure; round-9 A/B). 512 MiB/core is still modest.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // -Xms = -Xmx + pre-touch (what spark-submit does for executors): a
  // lazily-committed heap makes allocation-heavy queries pay first-touch
  // page faults + zeroing INSIDE the query — invisible to GC counters.
  // Round-12 adjudication of the r11 bench anomaly: q166 at a 90g heap
  // ran 11-44 s (vs 2.7 s adjudicated) with only ~0.3-1.3 s counted GC;
  // -Xms alone still 12.2 s; -Xms + AlwaysPreTouch -> 2.64 s at 90g and
  // 3.23 s (vs 4.73) at the 16g default. Pre-touch cost is startup-only,
  // outside every timed window.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
