package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.ExtractHtmlText.extract_html_text
import graft.sources.{PageGen, PageGenConfig}
import graft.streaming.{ExactlyOnceSink, MetricsListener, Sessionize}

/**
 * End-to-end streaming page-pipeline benchmark — the E1-equivalent
 * topology (SURVEY.md §3.1): page stream → deterministic extraction →
 * per-host sessionization → exactly-once sink.
 *
 * Input is pre-generated Parquet (so source generation cost is excluded),
 * streamed with `Trigger.AvailableNow` + `maxFilesPerTrigger` to get a
 * realistic multi-micro-batch run with watermark progression. Reports
 * sustained pages/sec and p99 micro-batch latency from the
 * [[graft.streaming.MetricsListener]].
 */
object StreamPipelineBench {

  final case class Result(rows: Long, wallSec: Double, rowsPerSec: Double, p99Ms: Long)

  def run(spark: SparkSession, nPages: Long, cpus: Int,
      filesPerTrigger: Int = 8, nFiles: Int = 64): Result = {
    val work = Files.createTempDirectory("streambench").toString
    val srcDir = s"$work/pages"
    val cfg = PageGenConfig(nPages = nPages, nHosts = 200, parallelism = cpus)
    PageGen.rawPages(spark, cfg).repartition(nFiles).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val sink = new ExactlyOnceSink(s"$work/out")
    val listener = new MetricsListener()
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val pages = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(srcDir)
      .withColumn("text", extract_html_text(col("html")))
      .drop("html")
    val sessions = Sessionize.fromPages(spark, pages, watermark = "2 hours")
    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((ds: org.apache.spark.sql.Dataset[graft.model.HostSession], id: Long) =>
        sink.write(ds.toDF(), id))
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)
    Result(nPages, wall, nPages / wall, listener.p99LatencyMs)
  }
}
