ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtspark"
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
// Pass the forked run JVM's streams through untouched instead of
// re-logging them line-by-line with "[info] "/"[error] " prefixes:
// the bench/verify contract prints ONE machine-readable JSON line on
// stdout, and the decoration made it unparseable to stdout-tail
// consumers (every BENCH_r*.json back to round 1 has parsed:null).
// With StdoutOutput the subprocess's stdout (the JSON artifact) stays
// bare and its stderr (Spark log4j noise) goes to real stderr.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // dev-only attribution hook (r19): extra JVM flags for the forked run
  // (e.g. GRAFT_RUN_JAVA_OPTS="-Xlog:gc" for GC-attribution experiments).
  // Unset in driver runs — the bench JVM is unchanged by default.
  sys.env.get("GRAFT_RUN_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
