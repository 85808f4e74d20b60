ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "admiraetlprojectpruebaspark"
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
  // local[N] runs all N executor threads inside this one JVM: at 32
  // threads an 8g heap is 250MB/task and the sf10 sweep accumulates GC
  // pressure query-over-query (dedup_exact read 4-7s mid-sweep vs 1.2s
  // isolated). Default to a quarter of physical RAM capped at 32g (the
  // bench host's setting) so a laptop's JVM is never sized past what
  // the OS can back (r9, ADVICE: a fixed 32g on a <32GiB host gets
  // OOM-killed mid-run instead of failing with a heap error); override
  // either way via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGb = try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (os.getTotalMemorySize / (1L << 30)).toInt
    } catch { case _: Throwable => 8 }
    s"${math.max(2, math.min(32, physGb / 4))}g"
  })}",
)
