package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/**
 * Per-batch streaming metrics: rows, durations, event-time watermark, and
 * per-source offsets — the observability the north rule asks for
 * ("resumable from checkpoint with per-partition offset+watermark
 * metrics").
 *
 * Reference analog: the MJPEG debug endpoint
 * (`operation/MjpegStreamingOp.java:58-282`) was the reference's only
 * visibility; here progress is structured (JSONL) and queryable.
 */
final case class BatchMetric(
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    durationMs: Long,
    watermark: String,
    stateRows: Long,
    sourceOffsets: String)

class MetricsListener(jsonlPath: Option[String] = None) extends StreamingQueryListener {

  val batches: mutable.ArrayBuffer[BatchMetric] = mutable.ArrayBuffer.empty

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    val m = BatchMetric(
      p.batchId,
      p.numInputRows,
      p.inputRowsPerSecond,
      p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
      Option(p.eventTime.get("watermark")).getOrElse(""),
      stateRows,
      Option(p.sources).map(_.map(s => s.endOffset).mkString(";")).getOrElse(""))
    batches.synchronized { batches += m }
    jsonlPath.foreach { path =>
      Files.write(Paths.get(path), (p.json + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def totalRows: Long = batches.synchronized(batches.map(_.numInputRows).sum)

  /** p99 of per-batch trigger latency (ms) over non-empty batches. */
  def p99LatencyMs: Long = batches.synchronized {
    val ds = batches.filter(_.numInputRows > 0).map(_.durationMs).sorted
    if (ds.isEmpty) 0L else ds(math.min(ds.size - 1, (ds.size * 0.99).toInt))
  }
}
