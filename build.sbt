ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chronotsspark"
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
// Pass forked-run stdout through verbatim: sbt's default logger prefixes
// every line with "[info] ", which corrupts Bench's one-line JSON contract.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." trailer: the harness keeps only a
// 2000-char tail of run output, and Bench's one-line JSON must be the
// last thing in it — the trailer was eating ~75 chars of that budget.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // -Xms = -Xmx: lazy heap growth made the FIRST heavy sort in a fresh
  // JVM run under GC storms while the heap expanded (measured r12:
  // pass-1 of a 12.6M-row sort 27-145 s, converging to 8-20 s once the
  // heap had grown) — benchmark runs must not time heap expansion.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
