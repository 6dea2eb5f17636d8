ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparketlclispark"
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
// Oracles.scala is DuckDB oracle SQL consumed only by the Verify
// correctness dump — test scaffolding, not engine code. It lives in a
// tools/ source set (round-6 advisor item 7) so `src/main` holds only
// the engine; it still compiles into the Compile scope because the
// driver contract pins `SparkEntry.oracleSql` (a main-scope API) as the
// oracle transport.
Compile / unmanagedSourceDirectories += baseDirectory.value / "tools" / "oracle-src"
// The round driver runs `sbt "runMain graft.Bench"` and parses the LAST
// ~2000 chars of output for one bare JSON line. Two things broke that in
// rounds 1-2: sbt's default LoggedOutput prefixes forked stdout with
// "[info] ", and "[success] Total time..." trails the JSON. Forward the
// forked process's stdout verbatim and drop the success banner so the
// bench JSON is the literal last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
