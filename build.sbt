ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tegallegaspark"
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
// Forked run output goes straight to stdout, NOT through the sbt logger:
// the logger prefixes every line with "[info] ", which breaks any
// downstream parser expecting the bench/verify JSON lines raw.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Round-17 (r16 VERDICT #6): `sbt test` ran its 59 suites sequentially
// in ONE forked JVM (15.4 min wall / 43 min CPU on 32 cores) and the
// round driver's test budget expired mid-suite. Partition the suites
// into 4 forked JVMs that run CONCURRENTLY — each fork has its own
// SparkSession (so the session-global conf flips the loop levers use
// can never race across suites, preserving the documented one-planner-
// per-session contract) and its own warehouse dir (managed tables
// can't collide). The four known-heavy suites are pinned to separate
// groups so no group inherits two of them; the rest spread by name
// hash. Coverage is byte-identical — same tests, same assertions.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / javaOptions).value
  val pinned = Map(
    "graft.QueriesSpec" -> 0, "graft.RoutingSpec" -> 1,
    "graft.GtfsGoldenSpec" -> 2, "graft.StreamingSpec" -> 3)
  val nGroups = 4
  (0 until nGroups).map { g =>
    val members = tests.filter(t => pinned.getOrElse(t.name,
      math.abs(t.name.hashCode) % nGroups) == g)
    Tests.Group(s"g$g", members, Tests.SubProcess(ForkOptions()
      .withRunJVMOptions((base :+
        s"-Dgraft.test.warehouse=/tmp/graft-test-warehouse-g$g").toVector)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4), Tags.limitAll(8))
