ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scccudaspark"
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
// Suites share one SparkSession (TestSpark); concurrent suites would race
// on session-global observables (persistent-RDD counts in the release()
// tests, plan/stage asserts in PlanSpec) — run them serially.
Test / parallelExecution := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin the initial heap to the max: ParallelGC otherwise starts at ~2g and
  // collects furiously while growing toward -Xmx — a fresh JVM on the
  // 61M-edge SCC point measured 381/293 s wall with gcSec ≈ 51% of taskSec
  // unpinned vs 199/219 s at ~45% pinned (BASELINE.md round-5 GC A/B).
  // One JVM at a time on a 125 GiB box, so committing 48g up front is free.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Throughput collector: measured 14% faster end-to-end than G1 on the
  // SCC bench point (and ~45% lower task-thread CPU — G1's concurrent
  // write barriers tax the checkpoint row-copy loop); standard choice for
  // batch Spark executors. Emitted only when SPARK_GC_OPTS is unset: two
  // enabled collectors (e.g. +UseParallelGC then +UseG1GC) make the JVM
  // refuse to start, so an override fully owns the GC choice.
) ++ sys.env.get("SPARK_GC_OPTS").map(_.split("\\s+").toSeq)
  .getOrElse(Seq("-XX:+UseParallelGC"))
