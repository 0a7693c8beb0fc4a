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
  // 8g, A/B-measured (round 11): bigger heaps HURT this workload —
  // IsoBench q311 (per-round persist/unpersist churn) at 8g runs
  // 14.3/7.8/7.1 s over 3 passes, at 16g 24.7/13.0/10.3, at 48g
  // 21.4/39.3/66.9 (degrading per pass: G1 defers collection of the
  // block-churn garbage until mixed collections stall the driver).
  // The whole-suite bench confirmed: 375 s at 8g vs 446 s at 48g on
  // the same host hour. Bench's env.heap_g records the value at the
  // gate; override per-run via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
