package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ExtractHtmlText.extract_html_text
import graft.operators.Windows
import graft.sources.{PageGen, PageGenConfig}

/** Stage-by-stage scaling diagnostic (not part of the driver contract). */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 600000L
    val work = Files.createTempDirectory("scalediag").toString
    val srcDir = s"$work/pages"

    def sess(cpus: Int) = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"diag$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // generate once at 32
    {
      val s = sess(32)
      val cfg = PageGenConfig(nPages = nPages, nHosts = 200, parallelism = 32)
      PageGen.rawPages(s, cfg).repartition(256).write.parquet(srcDir)
      s.stop()
    }

    for (cpus <- Seq(8, 32, 8, 32)) {
      val s = sess(cpus)
      val schema = s.read.parquet(srcDir).schema
      def time(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[diag] cpus=$cpus $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("scan_count") {
        s.read.parquet(srcDir).selectExpr("count(*)").collect()
      }
      time("scan_extract") {
        s.read.parquet(srcDir)
          .select(length(extract_html_text(col("html"))).as("l"))
          .agg(sum(col("l"))).collect()
      }
      time("extract_session_agg") {
        val p = s.read.parquet(srcDir)
          .withColumn("text", extract_html_text(col("html"))).drop("html")
        Windows.session(p, "warc_ts", "30 minutes", Seq(col("host")),
          Seq(count(lit(1)).as("n"), sum(length(col("text"))).as("tc")))
          .write.format("noop").mode("overwrite").save()
      }
      time("stream_pipeline") {
        val r = graft.StreamPipelineBench.run(s, nPages, cpus)
        println(f"[diag]   stream pps=${r.rowsPerSec}%.0f p99=${r.p99Ms}ms")
      }
      s.stop()
    }
  }
}
