ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions ++= Seq("-deprecation", "-feature")
name := "rootstockcollectivestatesyncspark"
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
// The driver parses graft.Bench's one-line JSON from captured stdout;
// sbt's default LoggedOutput prefixes every forked-process line with
// "[info] ", which has broken that parse every round so far. StdoutOutput
// passes the forked JVM's stdout through verbatim.
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
  // A long-lived session compiling a ~100-query catalog's worth of
  // whole-stage-codegen classes exhausts the JDK-default 240 MB code
  // cache; the JIT then stops compiling and codegen-heavy scans run
  // interpreted at 5-15x (the BENCH_r08 pathology: q91 27.1 s in the
  // full-catalog JVM vs 2.06 s fresh-JVM). 512 MB + flushing keeps the
  // compiler alive for the catalog AND for a real long-running
  // pipeline session. Heap: 8g put 14.2 s of GC into one q89 pass on a
  // 128 GiB box; 16g is the catalog-sized default (override with
  // SPARK_DRIVER_MEM).
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
