ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pefirminvestmentdatabasepipelinespark"
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
// Artifact framing (VERDICT r10 #3): the driver captures this process's
// merged stdio and tries to json-parse the FINAL line. sbt's default
// LoggedOutput prefixes forked-run stdout with "[info] " and then prints
// "[success] Total time: …" AFTER the program exits — every round's
// BENCH_r*.json recorded "parsed": null because of exactly those two
// wrappers. StdoutOutput passes program stdout through verbatim, and
// showSuccess/showTiming=false silence the trailing banner, so the bench
// JSON line is the last thing on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// the lint doesn't see command-consumed keys; both are read by sbt itself
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 8g caused multi-second GC pauses in local[32] benches; the box has 125g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Catalyst funnels thousands of distinct expression trees through a few
  // shared eval call sites; the default recompilation cutoffs (400/200)
  // eventually mark those methods not-compilable after deopt churn, pinning
  // interpreted-eval paths in the bytecode interpreter (observed: 100x+
  // intermittent scan stalls). Raise the cutoffs so HotSpot keeps
  // recompiling instead of giving up.
  "-XX:PerMethodRecompilationCutoff=10000",
  "-XX:PerBytecodeRecompilationCutoff=10000",
)
