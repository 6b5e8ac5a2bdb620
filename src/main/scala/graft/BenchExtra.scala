package graft

import org.apache.spark.sql.SparkSession

/**
 * Ad-hoc per-query measurement harness for optimization work (guide §1.4):
 * times only the queries named on the command line (prefix match), with the
 * same session config, noop sink and best-of-N methodology as [[Bench]], and
 * optionally dumps `.explain("formatted")` per query.
 *
 * Usage: runMain graft.BenchExtra [--explain DIR] [--reps N] [--jobs] name...
 * (no names = all queries). NOT part of the driver contract — [[Bench]] is
 * the frozen measurement; this exists so a single query can be iterated on
 * without paying for the other 124.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    var explainDir: Option[String] = None
    var reps = 2
    var showJobs = false
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--jobs" => showJobs = true; i += 1
        case n => names += n; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picked =
      if (names.isEmpty) Queries.all
      else Queries.all.filter(q => names.exists(q.name.startsWith))
    // same warm-up discipline as Bench
    try Queries.all.head.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val sc = spark.sparkContext
    picked.foreach { q =>
      explainDir.foreach { dir =>
        val plan = q.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(q.name + ".txt"),
          plan.getBytes("UTF-8"))
      }
      val times = (1 to reps).map { _ =>
        val j0 = sc.statusTracker.getJobIdsForGroup(null).length
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val j1 = sc.statusTracker.getJobIdsForGroup(null).length
        (dt, j1 - j0)
      }
      val jobs = if (showJobs) s" jobs=${times.map(_._2).mkString(",")}" else ""
      println(f"${q.name}%-28s best=${times.map(_._1).min}%7.3f  runs=${times.map(t => f"${t._1}%.3f").mkString(",")}$jobs")
    }
    spark.stop()
  }
}
