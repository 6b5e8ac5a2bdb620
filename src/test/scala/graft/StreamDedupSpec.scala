package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ExactlyOnceSink, StreamDedup}

final case class DocRow(doc_id: Long, event_ts: Timestamp, text: String)

/** Ingest-time dedup: duplicates within the watermark horizon are dropped,
  * across micro-batches AND across a kill/resume of the query. */
class StreamDedupSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L

  test("stream dedup drops in-horizon duplicates across batches and resume") {
    import spark.implicits._
    val cp = Files.createTempDirectory("ddcp").toString
    val table = Files.createTempDirectory("ddtbl").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)

    def start() = StreamDedup.byFingerprint(in.toDF(), "text", "event_ts", "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.write(df.toDF(), id))
      .start()

    var q = start()
    in.addData(DocRow(1, ts(base), "Alpha beta gamma."), DocRow(2, ts(base + 10), "delta"))
    q.processAllAvailable()
    // same normalized content (case/punct differ) in a LATER batch: dropped
    in.addData(DocRow(3, ts(base + 20), "alpha BETA gamma"))
    q.processAllAvailable()
    q.stop() // kill

    q = start() // resume: fingerprint state must survive the restart
    in.addData(DocRow(4, ts(base + 30), "ALPHA beta gamma!!"), DocRow(5, ts(base + 40), "epsilon"))
    q.processAllAvailable()
    q.stop()

    val got = sink.read(spark).select($"doc_id").as[Long].collect().sorted
    // 1 survives; 3 and 4 are duplicates of 1; 2 and 5 are unique
    assert(got.toSeq == Seq(1L, 2L, 5L), s"got ${got.toSeq}")
  }

  test("batch mirror: q39 fingerprint groups match the streaming op's identity") {
    import spark.implicits._
    val rows = Seq(
      DocRow(1, ts(base), "Alpha beta gamma."),
      DocRow(2, ts(base + 10), "delta"),
      DocRow(3, ts(base + 20), "alpha BETA gamma"))
    val fp = rows.toDF()
      .select(graft.operators.TextAnalysis.fingerprint($"text").as("fp"), $"doc_id")
      .groupBy($"fp").count().collect()
    assert(fp.length == 2 && fp.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }
}
