ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordb_bioinsightspark"
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
// Pass the forked JVM's stdout through RAW instead of via sbt's
// logger: the Bench/Verify driver contract is a machine-parsed JSON
// line on stdout, and the default LoggedOutput prepends "[info] " to
// every line — which breaks a strict json.loads on the captured tail.
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
// Driver/executor heap for the forked local[N] JVM. 8g was measured
// under-provisioned for the 163-query bench session at local[32]
// (250 MB/core): GC pressure from accumulated broadcast/checkpoint
// bookkeeping contaminated later queries' times by multiple seconds
// each (r21 paired sweeps, identical code: 8g = 177.8 s total with
// ±8 s per-query swings, 24g = 149.7 s and stable). 24g on the
// 128 GiB box is 750 MB/core — ordinary executor sizing (guide §5),
// parameterised via SPARK_DRIVER_MEM. r22 (VERDICT item 8): the
// DEFAULT is floored to physical/4 on hosts below ~96 GiB so a dev
// laptop does not fail at JVM start (r21's flat 24g default did);
// on the 128 GiB bench box the derived default is 24g, identical to
// r21 — the bench contract is unchanged.
def defaultHeap: String = {
  val physGiB = try {
    scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal"))
      .map(_.replaceAll("[^0-9]", "").toLong / (1024L * 1024L))
      .getOrElse(0L)
  } catch { case _: Throwable => 0L } // non-Linux: conservative 8g
  if (physGiB >= 96) "24g"
  else if (physGiB > 0) s"${math.max(2L, physGiB / 4)}g"
  else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
