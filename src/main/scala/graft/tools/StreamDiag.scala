package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.streaming.StreamingQueryListener._

import graft.functions.ExtractHtmlText.extract_html_text
import graft.sources.{PageGen, PageGenConfig}
import graft.streaming.{ExactlyOnceSink, Sessionize}

/** Per-batch duration breakdown for streaming scaling (diagnostic). */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 600000L
    val paraMult = if (args.length > 1) args(1).toInt else 1
    val coresList = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(8, 32)
    val work = Files.createTempDirectory("streamdiag").toString
    val srcDir = s"$work/pages"

    def sess(cpus: Int) = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"sdiag$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    {
      val s = sess(32)
      val cfg = PageGenConfig(nPages = nPages, nHosts = 2000, paraMult = paraMult,
        parallelism = 32)
      PageGen.rawPages(s, cfg)
        .repartitionByRange(256, col("warc_ts"))
        .sortWithinPartitions(col("warc_ts"))
        .write.parquet(srcDir)
      s.stop()
    }

    class L(tag: String) extends StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[sdiag] $tag batch=${p.batchId} rows=${p.numInputRows} $dur")
      }
    }

    class StageL extends SparkListener {
      val t0 = System.nanoTime()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = for {
          a <- si.submissionTime; b <- si.completionTime
        } yield b - a
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} wall=${wall.getOrElse(-1L)}ms " +
          f"taskSum=${m.executorRunTime}ms gc=${m.jvmGCTime}ms " +
          f"name=${si.name.take(60)}")
      }
    }

    for (mode <- Seq("extract_only", "sessionize_memory", "full_eos"); cpus <- coresList) {
      val s = sess(cpus)
      if (sys.env.contains("GRAFT_STAGE_DIAG")) s.sparkContext.addSparkListener(new StageL)
      val schema = s.read.parquet(srcDir).schema
      val l = new L(s"$mode/$cpus")
      s.streams.addListener(l)
      val t0 = System.nanoTime()
      val pages = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 128).parquet(srcDir)
        .withColumn("text", extract_html_text(col("html"))).drop("html")
      val q = mode match {
        case "extract_only" =>
          pages.select(length(col("text")).as("l"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", Files.createTempDirectory("cp").toString)
            .trigger(Trigger.AvailableNow())
            .foreachBatch((d: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => { d.count(); () })
            .start()
        case "sessionize_memory" =>
          Sessionize.fromPages(s, pages)
            .writeStream.outputMode("append").format("memory")
            .queryName(s"sd_$cpus")
            .option("checkpointLocation", Files.createTempDirectory("cp").toString)
            .trigger(Trigger.AvailableNow())
            .start()
        case "full_eos" =>
          val sink = new ExactlyOnceSink(Files.createTempDirectory("tbl").toString)
          Sessionize.fromPages(s, pages)
            .writeStream.outputMode("append")
            .option("checkpointLocation", Files.createTempDirectory("cp").toString)
            .trigger(Trigger.AvailableNow())
            .foreachBatch((d: org.apache.spark.sql.Dataset[graft.model.HostSession], id: Long) =>
              sink.write(d.toDF(), id))
            .start()
      }
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[sdiag] TOTAL $mode cpus=$cpus wall=$wall%.1f s pps=${nPages / wall}%.0f")
      s.streams.removeListener(l)
      s.stop()
    }
  }
}
