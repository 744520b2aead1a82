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
// Commit the whole heap at JVM start (-Xms = -Xmx + AlwaysPreTouch):
// with a large -Xmx and the default tiny -Xms, G1 grows the heap
// incrementally under allocation pressure — each expansion is a 1-4 s
// pause and the freshly-committed pages then page-fault throughout the
// mutators. Measured on this box at -Xmx90g: q48 22.3 s -> 0.7 s,
// q43 12-52 s -> 1.9-3.3 s once the heap is pre-touched. The pre-touch
// cost is paid once at startup, before anything is timed.
val heapSize = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$heapSize", s"-Xmx$heapSize",
  "-XX:+AlwaysPreTouch",
)
