ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbscanonsparkspark"
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
// Forked run writes straight to stdout (no "[info] " prefix) so the
// bench/verify drivers can parse the single JSON result line.
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
javaOptions ++= jdk17AddOpens ++
  sys.env.get("SPARK_DRIVER_XMS").map(x => s"-Xms$x").toSeq ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 128 GiB box; headroom keeps GC out of the bench numbers (the
  // 48-query session accumulates shuffle/cache structures). -Xms is
  // OPT-IN (SPARK_DRIVER_XMS): pre-committing the heap fixes the
  // scale-ladder's first-query heap-expansion storm (s30@100x: 95 s
  // first vs 31 s for s32 running a strict superset — the ladder
  // launcher sets it), but a fixed 24g heap measurably degrades the
  // LONG 272-query bench session (d11 1.6 s -> 54 s in two full-board
  // runs with -Xms, 3.5 s solo; G1's adaptive sizing never shrinks the
  // young gen it starts with). Don't set it for full-board runs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
