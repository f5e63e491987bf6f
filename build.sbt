ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seastreamerspark"
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
// The per-round driver captures `sbt runMain` stdout and json-parses the
// tail line-wise for graft.Bench's one-line metric JSON. sbt's default
// LoggedOutput decorates every forked-process line with "[info] " /
// "[error] ", which defeats that parse (BENCH_r14..r16 all carried
// "parsed": null with the JSON line fully present in the tail). Pass the
// forked process's stdio through raw instead; tools/parse_bench.py covers
// historical artifacts.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and its stdin connected: graft.Relay's `--input stdio:///key` reads
// THIS process's stdin (the README's `clock | relay` pipeline); sbt's
// default leaves the forked JVM's stdin unconnected, which would make the
// spool thread read EOF immediately and the demo silently relay nothing.
run / connectInput := true
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
