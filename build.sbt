ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataframesjlspark"
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
// Give the forked run JVM sbt's real stdout instead of the logger's
// [info]-prefixed pipe: the driver json-parses Bench's final stdout
// line, and a "[info] " prefix (or `--error`-level suppression) breaks
// that. With StdoutOutput the JSON line reaches the tail verbatim.
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
// Conf-experiment passthrough (r15 optimization work): semicolon-
// separated spark confs, e.g. GRAFT_EXTRA_SQLCONF=
// "spark.sql.join.preferSortMergeJoin=false" — SparkConf picks up any
// -Dspark.* system property, so these reach every forked main's
// session without editing each builder. Unset = exactly the old JVM.
javaOptions ++= sys.env.get("GRAFT_EXTRA_SQLCONF").toSeq
  .flatMap(_.split(";").filter(_.nonEmpty).map("-D" + _))
// raw JVM flag passthrough for the same experiments (e.g. GC choice)
javaOptions ++= sys.env.get("GRAFT_JVM_OPTS").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the 218-query bench/verify runs accumulate shuffle
  // + broadcast + codegen-cache footprint in ONE JVM; at 8g the later
  // queries ran 2-3x their isolated times from GC pressure alone
  // (round-4 verdict). The box has 128 GiB; local[32] is this JVM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
