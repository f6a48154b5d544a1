ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtschemabuilderspark"
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
// The bench driver parses graft.Bench's one-line JSON summary from
// stdout; sbt's trailing "[success] Total time ..." footer otherwise
// follows it as the LAST stdout line and defeats a parse-the-last-line
// reader. SPARK_GRAFT_SF_DIR is set exactly on bench invocations, so
// only those drop the footer — compile/test runs keep their epilogue.
showSuccess := !sys.env.contains("SPARK_GRAFT_SF_DIR")
// Forked `run` output is otherwise re-logged with an "[info] " prefix
// (the default LoggedOutput strategy), which would turn the bench's
// summary into "[info] {...}" and defeat any JSON-line parser. Emit the
// child's stdout verbatim instead.
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's command engine, not by a task —
// exempt it from the unused-key lint
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
