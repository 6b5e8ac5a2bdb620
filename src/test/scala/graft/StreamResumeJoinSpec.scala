package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.HostMeta
import graft.streaming.{ExactlyOnceSink, PageStream}

/** Stream-stream join state survives checkpoint kill/resume exactly-once. */
class StreamResumeJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("band join resumes from checkpoint; matches batch join; no duplicates") {
    import spark.implicits._
    val cp = Files.createTempDirectory("jcp").toString
    val table = Files.createTempDirectory("jtbl").toString
    val sink = new ExactlyOnceSink(table)
    val pIn = MemoryStream[PageRow](Encoders.product[PageRow], spark)
    val mIn = MemoryStream[HostMeta](Encoders.product[HostMeta], spark)

    def start() = PageStream.joinPagesWithMeta(pIn.toDF(), mIn.toDF(),
        bandUs = 600L * 1000000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.write(df.toDF(), id))
      .start()

    val base = 1700000000L
    val pages = scala.collection.mutable.ArrayBuffer[PageRow]()
    val metas = scala.collection.mutable.ArrayBuffer[HostMeta]()

    var q = start()
    pages += PageRow("https://a.example/1", "a.example", ts(base))
    metas += HostMeta("a.example", ts(base + 100), 1.0, "news")
    pIn.addData(pages.last); mIn.addData(metas.last)
    q.processAllAvailable()
    // page arrives now, its matching meta only AFTER the restart
    pages += PageRow("https://b.example/1", "b.example", ts(base + 50))
    pIn.addData(pages.last)
    q.processAllAvailable()
    q.stop() // kill

    q = start() // resume: buffered join state must still match b.example
    metas += HostMeta("b.example", ts(base + 400), 2.0, "docs")
    mIn.addData(metas.last)
    q.processAllAvailable()
    q.stop()

    val got = sink.read(spark).select($"url", $"category")
      .collect().map(_.toSeq)
    assert(got.length == got.distinct.length, "duplicate join rows after resume")
    val expected = pages.toSeq.toDF().join(metas.toSeq.toDF(), Seq("host"))
      .where(abs(unix_micros($"warc_ts") - unix_micros($"meta_ts")) <= 600L * 1000000L)
      .select($"url", $"category").collect().map(_.toSeq)
    assert(got.toSet == expected.toSet && got.nonEmpty,
      s"got=${got.toSet} expected=${expected.toSet}")
  }

  test("rate-driven page stream content is a pure function of id (arrival-order independent)") {
    import spark.implicits._
    // fromRate scrambles arrival order within blocks; the page CONTENT for
    // a given id must equal the batch generator's output for that id
    val cfg = graft.sources.PageGenConfig(nPages = 512L, nHosts = 10, parallelism = 4)
    val bounds = graft.sources.PageGen.hostBoundaries(cfg)
    // reproduce the arrival mix used by PageStream.fromRate
    val block = 128
    val seen = (0L until 512L).map { v =>
      val b = v / block
      val base = b * block
      val idx = v - base
      val mixed = base + ((idx * 757L + (graft.sources.PageGen.mix64(b) >>> 55)) % block)
      mixed % cfg.nPages
    }
    // every id's generated row is identical no matter when it arrives
    seen.distinct.foreach { id =>
      val g1 = graft.sources.PageGen.genPage(cfg, bounds, id)
      val g2 = graft.sources.PageGen.genPage(cfg, bounds, id)
      assert(g1.url == g2.url && java.util.Arrays.equals(g1.html, g2.html))
    }
    assert(seen.distinct.length > 256, "arrival scramble should still cover most ids")
  }
}
