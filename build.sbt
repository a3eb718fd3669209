ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbservicespark"
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
  // local[32] puts driver + all 32 executor threads in ONE JVM: the pinned
  // corpus, broadcast builds, and per-query lineage-cut blocks all share
  // this heap. 8g left ~2.3g of storage memory and the full 106-query
  // bench spent its interleave gap in GC + block eviction churn; the box
  // has 128 GiB, so size the single-JVM heap like the sum of executors it
  // stands in for.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // GC A/B (r6): G1's small committed heap gives ~114 young pauses/2-pass
  // run (3.3 s total, 25-330 ms each) — but pinning -Xms28g made it WORSE
  // (37 pauses, 4.1 s, max 1.25 s, plus 28 GB first-touch faults through
  // pass 1). Default adaptive sizing wins; the interleave tax is box
  // contention + scheduling, not GC. Left at default.
  // measured no-op at 768m (run3 34.5s vs run1 32.6s baseline): the JIT
  // code cache is NOT the interleave tax; left at default.
) ++ sys.env.get("SPARK_GRAFT_GCLOG").map(f => s"-Xlog:gc:$f").toSeq ++
  // Extra JVM flags for A/B experiments (space-separated), e.g.
  // SPARK_GRAFT_JAVAOPTS="-XX:+UseTransparentHugePages" — the box's THP
  // mode is `madvise` post-reboot, so the 28g heap only gets huge pages
  // when the JVM asks for them.
  sys.env.get("SPARK_GRAFT_JAVAOPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
