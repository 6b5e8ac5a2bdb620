package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.ExtractHtmlText.extract_html_text
import graft.sources.{PageGen, PageGenConfig}
import graft.streaming.Sessionize

/** Matrix diagnostic: cores × state partitions × provider (not driver contract). */
object StateDiag {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 600000L
    val work = Files.createTempDirectory("statediag").toString
    val srcDir = s"$work/pages"

    {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val cfg = PageGenConfig(nPages = nPages, nHosts = 2000, parallelism = 32)
      PageGen.rawPages(s, cfg)
        .repartitionByRange(256, col("warc_ts"))
        .sortWithinPartitions(col("warc_ts"))
        .write.parquet(srcDir)
      s.stop()
    }

    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for {
      cores <- Seq(8, 32)
      parts <- Seq(8, 32)
      provider <- Seq("hdfs", "rocksdb")
      rep <- Seq(1, 2)
    } {
      val b = SparkSession.builder().master(s"local[$cores]")
        .appName(s"sd$cores$parts$provider")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (provider == "rocksdb") {
        b.config("spark.sql.streaming.stateStore.providerClass", rocks)
        b.config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val schema = s.read.parquet(srcDir).schema
      val t0 = System.nanoTime()
      val pages = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64).parquet(srcDir)
        .withColumn("text", extract_html_text(col("html"))).drop("html")
      val q = Sessionize.fromPages(s, pages)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", Files.createTempDirectory("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[statediag] cores=$cores parts=$parts provider=$provider rep=$rep wall=$wall%.1f pps=${nPages / wall}%.0f")
      s.stop()
    }
  }
}
