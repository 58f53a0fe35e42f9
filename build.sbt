ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsimdbdatapipelinespark"
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
// Driver BENCH channel (r19): the driver runs `sbt "runMain graft.Bench"`
// and JSON-parses the LAST stdout line. With the default LoggedOutput
// strategy every forked-stdout line arrives wrapped in "[info] " and sbt
// appends a "[success] Total time: ..." banner — both defeat the parse
// (BENCH_r13..r18 all rc=0 yet parsed:null). StdoutOutput passes the
// forked process's stdout through verbatim, and showSuccess drops the
// banner, so Bench's compact summary line is genuinely last + unprefixed.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// both keys are consumed by the command engine, not a task graph —
// lintUnused false-positives on them
Global / excludeLintKeys ++= Set(showSuccess, outputStrategy)
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
  // headroom for whole-stage-codegen classes across a long query suite
  "-XX:ReservedCodeCacheSize=512m",
)
