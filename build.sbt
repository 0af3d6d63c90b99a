ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recommedationsystemunderflinkspark"
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
// Pass the forked run's stdout through verbatim (no "[info] " prefix):
// the driver parses Bench's one-line JSON from captured stdout, and the
// logger prefix breaks that parse (BENCH_r{1,2}.json: "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // 24g default (r13): the 8g default left the 288-lane bench GC-bound —
  // heavy lanes' scoped caches + localCheckpoint blocks pushed old-gen
  // occupancy high enough that FOLLOWING lanes absorbed the collection
  // cost (measured: q33_lang_id samples [1.3, 7.0, 11.2] at 8g vs
  // [1.0, 1.4, 1.3] at 24g; full-suite geomean 0.856 at 24g, same code).
  // Env-overridable as before; a cluster deployment sizes driver/executor
  // memory itself and never sees this default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
