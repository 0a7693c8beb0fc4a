ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pbetlspark"
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
// forward the forked process's stdout/stderr RAW (no [info]/[error]
// prefixes): Bench's one-line JSON must be machine-parseable from stdout
run / outputStrategy := Some(StdoutOutput)
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
  // 8g default; the gate may override via SPARK_DRIVER_MEM and the
  // G1 flags below make the choice IRRELEVANT (round 12, measured).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Heap-size robustness (round 12). Mechanism, measured on this
  // Firecracker-class VM: fresh page faults commit at ~25 MB/s
  // (RSS growth sampled during -XX:+AlwaysPreTouch, which would need
  // >1 h for 96g and was rejected). At -Xmx96g, stock G1 oscillates
  // the COMMITTED heap (expand to ~20g on GCTimeRatio pressure, then
  // uncommit at cycle end, then re-expand) and every re-committed
  // page pays the ~25 MB/s fault cost again — IsoBench passes of
  // 190-215 s on q192/q311 whose 8g truth is 5-9 s, and the r11 gate
  // bench at heap_g=89 recorded q192 at 24.5 s vs 6.0 s clean.
  // The four flags below pin the committed footprint small and
  // MONOTONE: tolerate 20% GC time before expanding (GCTimeRatio=4),
  // expand only when <5% free (MinHeapFreeRatio=5), NEVER uncommit
  // (MaxHeapFreeRatio=100 — each page faults at most once), collect
  // early so the small footprint suffices (IHOP=30), and 32m regions
  // so cached-block arrays avoid humongous fragmentation. Measured
  // (IsoBench 3-pass min, q192/q311): 96g stock = 10.9/25.7 s with
  // 189/214 s outlier passes; 96g+flags = 4.7/8.7 s, committed peak
  // 9.7g, no outliers; 8g+flags = 4.3/9.0 s. Heap no longer predicts
  // performance; SPARK_GC_FLAGS appends per-run overrides for A/Bs.
  "-XX:GCTimeRatio=4",
  "-XX:MinHeapFreeRatio=5",
  "-XX:MaxHeapFreeRatio=100",
  "-XX:InitiatingHeapOccupancyPercent=30",
  "-XX:G1HeapRegionSize=32m",
) ++ sys.env.get("SPARK_GC_FLAGS").toSeq.flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
