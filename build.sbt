ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jhudataparserspark"
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
// The driver scrapes the LAST stdout line of `sbt "runMain graft.Bench"`
// as the bench artifact. Two sbt behaviors have broken that for five
// rounds (BENCH_r0{5..9}.json parsed:null):
//   1. forked-process stdout is re-logged with an "[info] " prefix,
//      so the JSON line is not bare JSON;
//   2. sbt appends "[success] Total time: ..." AFTER the program's
//      final line, so a parse-the-last-line driver sees the epilogue.
// StdoutOutput passes the forked JVM's stdout through verbatim (no
// prefix); showSuccess/showTiming=false drop the epilogue entirely.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// the two keys are read by sbt's command loop, not by tasks — lint can't see that
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
)
