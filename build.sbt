ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duck_serverspark"
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
// The bench contract requires graft.Bench's one-line JSON summary to
// reach the caller's stdout RAW: sbt's default forked-output strategy
// prefixes every child line with "[info] "/"[error] ", which has made
// the driver's parse fail every round (BENCH_r10..r15: parsed=null).
// StdoutOutput passes the child's stdout/stderr through unprefixed.
outputStrategy := Some(StdoutOutput)
// …and drop sbt's trailing "[success] Total time: …" stdout line so the
// bench's summary JSON is the LAST line a tail capture sees.
showSuccess := false
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
  // 16g: the 126-query bench corpus in one JVM accumulates shuffle
  // buffers/broadcasts/checkpoint blocks; at 8g old-gen pressure showed
  // up as ±10% run-to-run swings on the heavy tail (host has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
