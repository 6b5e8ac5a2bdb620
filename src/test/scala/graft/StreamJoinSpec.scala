package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.HostMeta
import graft.streaming.PageStream

case class PageRow(url: String, host: String, warc_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("watermarked stream-stream join matches the batch band join") {
    import spark.implicits._
    val pIn = MemoryStream[PageRow](Encoders.product[PageRow], spark)
    val mIn = MemoryStream[HostMeta](Encoders.product[HostMeta], spark)
    val joined = PageStream.joinPagesWithMeta(pIn.toDF(), mIn.toDF(),
      bandUs = 600L * 1000000L)
    val q = joined.writeStream.format("memory")
      .queryName("join_out").outputMode("append").start()
    try {
      val base = 1700000000L
      val pages = Seq(
        PageRow("https://a.example/1", "a.example", ts(base)),
        PageRow("https://a.example/2", "a.example", ts(base + 3000)),
        PageRow("https://b.example/1", "b.example", ts(base + 100)))
      val metas = Seq(
        HostMeta("a.example", ts(base + 120), 1.5, "news"),   // in band of page 1 only
        HostMeta("a.example", ts(base + 2900), 2.5, "shop"),  // in band of page 2
        HostMeta("b.example", ts(base + 9000), 3.5, "docs"),  // out of band
        HostMeta("c.example", ts(base + 50), 4.5, "blog"))    // no pages
      pIn.addData(pages.take(2)); mIn.addData(metas.take(1))
      q.processAllAvailable()
      pIn.addData(pages.drop(2)); mIn.addData(metas.drop(1))
      q.processAllAvailable()

      val got = spark.table("join_out")
        .select($"url", $"category").collect().map(_.toSeq).toSet
      val expected = pages.toDF().join(metas.toDF(), Seq("host"))
        .where(abs(unix_micros($"warc_ts") - unix_micros($"meta_ts")) <= 600L * 1000000L)
        .select($"url", $"category").collect().map(_.toSeq).toSet
      assert(got == expected && got.nonEmpty, s"stream=$got batch=$expected")
    } finally q.stop()
  }
}
