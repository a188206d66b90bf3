ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "slingclispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // embedded engine for EXECUTING the duckdb-dialect renders (resolves
  // from the pre-warmed offline cache like the test deps)
  "org.duckdb" % "duckdb_jdbc" % "1.0.0",
)
Test / fork := true
run / fork := true
// Route the forked child's stdout RAW to this process's stdout instead of
// through sbt's logger: the logger prefixes every line with "[info] ",
// which is exactly what kept the driver's bench-artifact parse failing
// (BENCH_r14..r18 all carry `parsed: null` — the JSON contract line never
// appeared unprefixed). With StdoutOutput the bench's one-line JSON lands
// bare on stdout. UNSCOPED on purpose: `runMain` (how the driver invokes
// the bench) does not delegate to `run / outputStrategy` — the bare key is
// in every fork task's delegation chain.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // spark-submit injects this too; arrow-memory-netty needs it on JDK 17
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
