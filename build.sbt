ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rupphashspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // LAZY heap here, deliberately (round-6 fix of the round-5 OOM): this
  // sbt-forked JVM is the bench's part-1 / test runner, not a measured
  // pipeline shot. Round 5 pre-touched SPARK_DRIVER_MEM (~90 GiB in the
  // driver env) here AND in each measured child JVM — two fully-resident
  // ~90 GiB heaps plus the ~7 GB tmpfs-staged corpus cannot fit the
  // 128 GiB cgroup: the OOM killer ended every BENCH_r05 run (exit 137).
  // The pre-touch that actually fixes measurement variance lives only in
  // Bench.runIsolated's child JVMs, budgeted against /proc/meminfo there.
)
Test / parallelExecution := false
