ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ipydatacleanspark"
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
// The driver tail-captures sbt stdout and json-parses the LAST line for the
// bench metric. Two sbt behaviors broke that in r1-r3: forked-run output is
// logged with an "[info] " prefix (not valid JSON), and sbt appends its own
// "[success] Total time ..." line AFTER the program's final println. Forward
// forked output raw and suppress the success banner so the program's last
// stdout line really is last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so the warning doesn't pollute captured stdout.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Escape hatch for stress sweeps (e.g. forcing operator spills to prove
// hash determinism survives UnsafeExternalSorter paths) without editing
// this file: space-separated JVM options appended to every forked run.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
