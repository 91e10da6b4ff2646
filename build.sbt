ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gotocr20spark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// No LANG/LC_ALL in this container → platform charset is ASCII; force
// UTF-8 so non-ASCII literals (entities, CJK fixtures) survive compile.
scalacOptions ++= Seq("-encoding", "utf8")
Test / fork := true
run / fork := true
// Forked `run` output passes straight through to this process's
// stdout/stderr with NO sbt "[info] " log prefix — the bench harness
// prints one machine-readable JSON line that a caller parses from the
// run tail, and the logger prefix broke that parse two rounds running.
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
  // local[32] = 32 executor threads in ONE JVM; a small heap makes GC the
  // shared bottleneck and destroys scaling. 125 GiB box → default high.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Pin + pre-touch: without -Xms the heap grows mid-run and the page
  // fault storm (fresh-page commit) dominates wall time, 10x run-to-run
  // variance in benchmarks. Pre-touch moves that cost to JVM startup.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
