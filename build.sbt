ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stormcvspark"
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
// the driver's benchmark invocation (marked by SPARK_GRAFT_SF_DIR) gets
// throughput-run JVM defaults unless explicitly overridden: a 32-thread
// streaming run on an 8 GB G1 heap measures GC, not the engine (see
// BENCH/BASELINE.md "environment hazards")
val benchRun = sys.env.contains("SPARK_GRAFT_SF_DIR")
val defaultHeap = if (benchRun) "32g" else "8g"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // pre-size (and optionally pre-touch) the heap: on this VM, concurrent
  // first-touch page faults from 32 allocating threads put the kernel at
  // 90% sys time for minutes while the heap grows (see BENCH notes)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM_MIN",
    sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap))}",
) ++ (if (sys.env.contains("SPARK_PRETOUCH") || benchRun)
        Seq("-XX:+AlwaysPreTouch") else Seq()) ++
  (sys.env.get("SPARK_GC") match { // e.g. SPARK_GC=parallel for throughput runs
    case Some("parallel") => Seq("-XX:+UseParallelGC")
    case None if benchRun =>
      // young gen scaled to the RESOLVED heap (a fixed -Xmn16g would
      // refuse to start if SPARK_DRIVER_MEM is set below 16g): half the
      // heap when the size is parseable in g/m, else let the GC pick
      val heap = sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap).toLowerCase
      def num(s: String): Option[Int] = scala.util.Try(s.toInt).toOption
      val halfMb = heap match {
        case s if s.endsWith("g") => num(s.dropRight(1)).map(_ * 1024 / 2)
        case s if s.endsWith("m") => num(s.dropRight(1)).map(_ / 2)
        case _ => None
      }
      Seq("-XX:+UseParallelGC") ++ halfMb.map(mb => s"-Xmn${mb}m")
    case _ => Seq()
  }) ++ sys.env.get("SPARK_XOPTS").map(_.split(" ").toSeq).getOrElse(Seq())
