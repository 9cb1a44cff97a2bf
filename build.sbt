ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "motorwayspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as the bench headline JSON. Two things used to get between the
// headline and end-of-stream: the logger's "[info] " prefix on forked
// output (breaks a bare json parse of the line) and sbt's
// "[success] Total time ..." epilogue (displaces the headline from the
// final line). StdoutOutput passes the forked JVM's stdout through
// raw, and showSuccess drops the epilogue — the headline println is
// then literally the process's last stdout line. Exit codes are
// unaffected; Spark logs ride stderr either way.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command engine, not a task — exempt it
// from the unused-key lint.
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
  // 16g default: the 113-query single-JVM bench run ages an 8g heap
  // (old-gen fills with broadcast/shuffle bookkeeping awaiting the
  // weak-ref ContextCleaner) and late-run queries measured ~3x their
  // isolated cost. The box has 128 GiB; 16g keeps GC out of the timings.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// Streaming suites share one SparkSession and memory-sink namespace;
// run test classes sequentially for determinism.
Test / parallelExecution := false

// Explicit root so the optional subproject below is NOT auto-aggregated:
// `sbt compile` / `sbt test` build exactly what they always built. All
// bare settings in this file attach to this root project.
lazy val root = (project in file("."))

// Optional aws-sdk-v2 adapter (graft.aws.*): production bindings for the
// KinesisApi/SqsApi/LeaseTable seams in graft.sources. The zero-egress
// default build never compiles it (no aggregation; the offline resolver
// has no SDK jars). With SDK jars on disk:
//   GRAFT_AWS_SDK_JARS=/path/to/aws-sdk-v2/jars sbt awsAdapter/compile
//   GRAFT_AWS_E2E=1 ... sbt awsAdapter/test   # live conformance suites
lazy val awsAdapter = (project in file("aws-adapter"))
  .dependsOn(root % "compile->compile;test->test")
  .settings(
    name := "graft-aws-adapter",
    Compile / unmanagedJars ++=
      ((file("/opt/spark/jars") * "*.jar") +++
       (file(sys.env.getOrElse("GRAFT_AWS_SDK_JARS", "aws-adapter/lib")) * "*.jar")).classpath,
    libraryDependencies += "org.scalatest" %% "scalatest" % "3.2.19" % Test,
    Test / parallelExecution := false,
    javaOptions ++= jdk17AddOpens,
    Test / fork := true,
  )
