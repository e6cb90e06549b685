ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sfguidegettingstartedopenflowpostgresqlcdcspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full 190-query bench generates thousands of whole-stage-codegen
  // classes in one JVM; the JDK default 240 MB reserved code cache fills,
  // the JIT stops compiling, and queries whose hot loop lives in GENERATED
  // bytecode (md5/conv/bin chains) intermittently run interpreted at
  // 15× the CPU (q_distinct_hll measured 18 vs 290 process-CPU-s on the
  // SAME plan). Size the cache for the suite and keep flushing on.
  // (r16 note: a q_pagerank wall spike at 252 queries was chased to a 2g
  // cache hypothesis and DISPROVEN — process-CPU was the same under 1g
  // and 2g, and the spike tracked the documented ambient slow band, so
  // the pin stays at 1g.)
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // Same pathology, second layer: Spark's generated-class cache holds 100
  // entries by default — a 190-query suite thrashes it, and every
  // re-compiled class restarts cold in the interpreter (the 385-CPU-s HLL
  // rep reproduced WITH the bigger code cache). Size it for the suite.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
)
