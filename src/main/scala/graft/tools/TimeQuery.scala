package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries

/** One-off registry-query timer (diagnostics — the per-query drill-down
  * behind a surprising `graft.Bench` sample):
  * `runMain graft.tools.TimeQuery <sfDir> <reps> <queryName...>`
  * Times each named query `reps` times with the Bench session config
  * and prints one line per run. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Queries.all if names(q.name); r <- 1 to reps) {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timequery] ${q.name} run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
