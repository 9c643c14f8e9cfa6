ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etl_pipelinespark"
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
// Forked run output goes straight to this process's stdout/stderr —
// no "[info] " sbt-logger prefix — so Bench's single JSON line is
// machine-parseable from the captured sbt output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
)

// ---- Parallel forked test groups -------------------------------------
// One sequential forked JVM ran the 636-test suite in ~25 min wall
// (suite bodies sum to ~14 min) — over the round driver's test budget
// (r20 verdict item 3). Suites share nothing across JVMs (per-JVM
// SparkTestSession with a temp warehouse, temp dirs everywhere), so
// they split into N forked JVMs bin-packed by measured suite weight
// (r21 duration run). N=6 at local[4] per session = 24 cores peak,
// ~20 GB peak heap — well inside the 32-core/128 GB sandbox.
val testGroupCount = 6
// measured seconds per suite (r21 -oD run); unlisted suites default
// small — exact staleness only skews balance, never correctness
val testSuiteWeights: Map[String, Int] = Map(
  "graft.IvfSpec" -> 135, "graft.HtmlSpec" -> 107,
  "graft.NearDupSinkSpec" -> 82, "graft.OpsSpec" -> 76,
  "graft.RetrievalSpec" -> 55, "graft.SessionSinkSpec" -> 49,
  "graft.StreamingAggSpec" -> 47, "graft.SketchesSpec" -> 38,
  "graft.StreamingDedupSpec" -> 35, "graft.PlanSpec" -> 34,
  "graft.ProfileSpec" -> 29, "graft.EventOpsSpec" -> 24,
  "graft.SignatureSinkSpec" -> 20, "graft.UpsertSinkSpec" -> 15,
  "graft.CurationSpec" -> 15, "graft.BpeSpec" -> 12,
  "graft.RobotsSpec" -> 10)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jo = (Test / javaOptions).value.toVector
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.Buffer.empty[TestDefinition], 0L))
  tests.sortBy(t => (-testSuiteWeights.getOrElse(t.name, 5), t.name))
    .foreach { t =>
      val i = bins.zipWithIndex.minBy(_._1._2)._2
      bins(i) = (bins(i)._1 += t,
        bins(i)._2 + testSuiteWeights.getOrElse(t.name, 5))
    }
  bins.toSeq.zipWithIndex.map { case ((ts, _), i) =>
    Tests.Group(s"g$i", ts.toSeq,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jo)))
  }
}
// the default limit runs forked groups one at a time — lift it to the
// group count (and keep the global task cap at the core count)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
