ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fdpdynamicallycontrolledstreamsspark"
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
// Driver-parse fix (round-15, verdict item 3): every BENCH_rN back to
// r01 shipped "parsed": null, and the r14 tail shows why — with
// fork:=true, sbt's default output strategy (LoggedOutput) wraps every
// program stdout line in "[info] ", which breaks any line-wise JSON
// parse, and the "[success] Total time ..." footer then occupies the
// final line. StdoutOutput passes the forked JVM's stdout through
// verbatim (no [info] prefix) and showSuccess:=false suppresses the
// footer, so Bench's closing summary line is the LAST line of stdout
// and parses bare whatever the driver's window/position contract is.
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — the
// unused-key lint cannot see that
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the bench host has 128 GiB and local[32] puts all
  // executor threads in the one driver JVM — 8g caused cache-eviction
  // churn artifacts in the round-1 bench
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 1g code cache (JDK 17 default: 240 MB). A 221-query bench session
  // generates thousands of unique whole-stage-codegen classes —
  // convergence loops whose per-round plans embed changing literals
  // compile fresh Janino classes EVERY round — and with zero old-gen
  // collections (r11 meta: G1 Old count=0) classes never unload, so
  // the code cache fills monotonically and the JIT sweeper starts
  // flushing/deoptimizing near the session tail. r11's unexplained
  // tail spikes (q217 run1 53 s, q219 run1 27 s, q216 runs growing
  // 11.9→19.8 s with flat task counts) carry that signature; heap GC
  // was ruled out (5.5 s young-gen across 1112 s). Bench records
  // per-query code-cache occupancy ("ccache_mb") as the evidence
  // trail.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
  // Codegen-class cache: Spark's default is 100 entries, and one run
  // of the heavy CDC/dedup queries alone generates more unique
  // whole-stage-codegen sources than that (q219: ~127 jobs/run), so
  // EVERY run recompiled its full class set — the r11/r12 probe
  // showed 72 s of JIT-compiler time in a cold q219 run and ~5-8 MB
  // of fresh code-cache per run, with C2 threads stealing CPU from
  // the 32 executor threads (the real cause of the r11 bench tail
  // spikes; GC was ~100 ms). 4096 entries lets a whole bench session
  // keep its codegen classes: measured q219 BenchOne steady-state
  // spread drops from [12.7, 21.8, 16.2, 7.1] to [6.5, 5.9, 7.4,
  // 7.1] s. Static SQL conf — must be set before the first
  // SparkSession, which is why it rides javaOptions.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
)
