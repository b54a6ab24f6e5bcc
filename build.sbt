ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nyctaxidatapredictionpysparkspark"
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
// The driver parses Bench's final JSON line from the last 2000 chars of
// combined output. Two things broke that in rounds 1-2: sbt's "[info] "
// prefix on forked-run stdout (raw passthrough fixes it) and the
// "[success] Total time ..." banner printed after the JSON (suppressed).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // Spark whole-stage codegen churns enough JIT'd classes across a long
  // session that the default 240MB code cache silently flushes hot methods
  // (10-40x slowdowns late in a run); give it real headroom.
  "-XX:ReservedCodeCacheSize=2g",
  // shuffle/spill dirs on RAM-backed tmpfs: the VM's root disk throttles
  // under sustained IO and stalls whole stages (observed 40x degradations)
  "-Dspark.local.dir=/dev/shm",
  "-Dspark.sql.warehouse.dir=/tmp/graft-warehouse",
  "-Dderby.system.home=/tmp/graft-derby",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
