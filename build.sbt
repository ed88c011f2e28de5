ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "grapefruitspark"
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
  // Pin the heap: -Xms == -Xmx (round-12 verdict item 1). With the
  // default adaptive heap the bench JVM's GC/JIT state depends on the
  // ALLOCATION HISTORY of whatever ran before the timed region — the
  // r11 harness restructure shifted it and three allocation-heavy
  // giant-regex queries moved ~40% with ZERO library changes (the
  // judge's harness-swap A/B, reproduced in SCALE.md round-12 notes).
  // A fixed-size heap removes heap-resize hysteresis as a variable, so
  // per-query numbers measure the queries, not the harness's warm-up
  // allocation shape.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Diagnostic seam: extra JVM flags for the forked run/test JVMs
// (e.g. GRAFT_JVM_EXTRA="-Xlog:gc:file=/tmp/gc.log" for the GC-log
// evidence behind SCALE.md's round-12 bench-JVM notes).
javaOptions ++= sys.env.get("GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
