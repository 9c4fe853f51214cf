ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmpbfparquetspark"
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
// The bench driver parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as the compact JSON metrics line. Two sbt decorations
// were defeating that (BENCH_r15.json "parsed": null): the "[success]
// Total time ..." banner printed AFTER the JSON, and the "[info] " prefix
// sbt's logger stamps on forked-run output. Kill both: no success banner,
// and forked run/runMain output goes straight to stdout unprefixed.
// Test results still report through scalatest's own summary lines.
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// both keys are consumed by sbt's command engine / fork runner, not by
// other tasks — lintUnused can't see that
Global / excludeLintKeys ++= Set(run / outputStrategy, Global / showSuccess)
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
  // FORK-FREE local FS (graft.fs.FastLocalFs scaladoc): without
  // libhadoop, stock RawLocalFileSystem forks /bin/chmod per created
  // file (~10-12 ms each, measured r20: 500 creates 5.3s -> 0.2s);
  // Spark reads spark.hadoop.* system props into every session's
  // hadoopConfiguration, so one flag covers bench/verify/tests/tools.
  "-Dspark.hadoop.fs.file.impl=graft.fs.FastLocalFileSystem",
  "-Dspark.hadoop.fs.AbstractFileSystem.file.impl=graft.fs.FastLocalFs",
  // committer v2 (one rename per task file instead of two): measured
  // -16% on st17's per-batch snapshot rewrites (SOAK_r20_gateknobs);
  // safe here because every durable store in this repo layers its OWN
  // _SUCCESS-marker commit protocol over the committer (latestVersion
  // reads only marked dirs; the idempotent sink overwrites whole
  // partitions on retry) - the v2 caveat (task output visible before
  // job commit) never reaches a reader. Standard at-scale setting
  // wherever renames are expensive (object stores).
  "-Dspark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
  // ROOT-locale number formatting: the tools build JSON artifacts with
  // f"%.2f" interpolation, which follows the default FORMAT locale — a
  // comma-decimal locale (de_DE) would render "1,23" and corrupt every
  // artifact. Pin the JVM rather than chase ~9 files of call sites.
  "-Duser.language=en", "-Duser.country=US",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
