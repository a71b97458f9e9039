ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spatialjoinspark"
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
  // SMALL pre-sized PRE-TOUCHED heap + G1. This sandbox kernel makes page
  // faults taken during a GC pause ~100-1000x more expensive than faults
  // taken single-threaded at startup (GC workers + 32 mutators convoy on
  // the mmap lock): with a 24g lazily-faulted heap, young evacuation into
  // never-touched regions produced pauses like User=1.16s Sys=227s
  // Real=10.3s until all 24 GB had been faulted once (~850-1050 GC core-s
  // per 1M-geom join stage). An 8g heap pre-touched at JVM init (~2-6 s,
  // before any measured window) cuts the same stage to <10 GC core-s and
  // the 32-core 1M-geom join from 54-67 s to ~11 s. Measured alternatives
  // that lost: ParallelGC (multi-second promotion-storm young pauses),
  // off-heap Tungsten (1.5-3x slower end-to-end), THP (GC-time 2M faults
  // pay synchronous defrag — one 29.9 s young pause).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("GRAFT_GCLOG").map(p => s"-Xlog:gc:$p").toSeq ++
  sys.env.get("GRAFT_JVMFLAGS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
