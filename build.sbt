ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sig_etlspark"
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
// Forked run output goes straight to this process's stdout/stderr
// instead of through sbt's logger, which prefixes every line with
// "[info] "/"[error] " — Bench's single JSON result line must reach
// the caller unprefixed to be machine-parseable.
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
// Heap policy: NO AlwaysPreTouch, and Xms stays small. First-touch of
// fresh pages on this VM is pathologically slow (a proactive-reclaim
// daemon returns cold pages to the host; re-faulting runs at ~25 MB/s):
// a measured -Xms90g -XX:+AlwaysPreTouch startup spent 64 MINUTES
// zeroing the heap before main() ran, and even a bare
// `java -Xms40g -XX:+AlwaysPreTouch -version` takes >5 min. Committing
// without touching (Xmx headroom, small Xms) keeps startup instant and
// only faults pages a query actually uses; G1 expansion commits are
// mmap-cheap, and the old "expansion pause" symptom was this same
// slow-fault cost, which pre-touch merely front-loads — catastrophically.
val heapMax = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Xms2g", s"-Xmx$heapMax",
)
