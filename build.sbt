ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "greenspacesspark"
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
// pass the forked process's stdout through VERBATIM (no [info] logger
// decoration) so the bench main's single JSON metric line stays
// machine-parseable by the grading driver
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
  // 16g: 32 concurrent parquet row-group readers over ~110KB binary rows
  // need headroom (an 8g heap OOM'd in ParquetFileReader.readNextRowGroup
  // on the 16 GB bench table)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)
// Pin the heap (Xms=Xmx + pre-touch) for `run` (the bench/verify mains):
// G1's uncommit/recommit cycles cause multi-second kernel-time stalls
// under this VM's memory management, which wrecked benchmark
// reproducibility at local[32]. Scoped to `run` only so test JVMs still
// launch on hosts without 16 GB free RAM (override via SPARK_DRIVER_MEM).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
