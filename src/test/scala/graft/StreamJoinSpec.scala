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

  test("randomized torture: band join equals batch on boundary-exact deltas") {
    import spark.implicits._
    val base = 1700000000L
    val bandUs = 1800L * 1000000L
    // deltas sit ON and ±1 s around the band edge, where inclusivity
    // mistakes in either the stream or the batch predicate would show
    val deltas = Array(-1801L, -1800L, -1799L, -1L, 0L, 1L, 1799L, 1800L, 1801L, 5000L)
    for (trial <- 0 until 4) {
      def rnd(k: Int, i: Int): Long = graft.sources.PageGen.rnd(173L + trial, k, i) >>> 1
      val nHosts = 2 + (rnd(0, 0) % 2).toInt
      val pages = (0 until (8 + (rnd(0, 1) % 8).toInt)).map { i =>
        val h = "h" + (rnd(1, i) % nHosts)
        PageRow(s"https://$h/$trial-$i", h, ts(base + (rnd(2, i) % 7200)))
      }
      val metas = (0 until (10 + (rnd(0, 2) % 8).toInt)).map { i =>
        val anchor = pages(((rnd(3, i) % pages.length)).toInt)
        val d = deltas((rnd(4, i) % deltas.length).toInt)
        // the per-row-unique category is what keeps joined rows distinct
        // (two metas can share (host, meta_ts) when they draw the same
        // anchor and delta)
        HostMeta(anchor.host,
          new Timestamp(anchor.warc_ts.getTime + d * 1000L),
          i.toDouble, s"cat$i")
      }
      val pIn = MemoryStream[PageRow](Encoders.product[PageRow], spark)
      val mIn = MemoryStream[HostMeta](Encoders.product[HostMeta], spark)
      val joined = PageStream.joinPagesWithMeta(pIn.toDF(), mIn.toDF(), bandUs = bandUs,
        pageWatermark = "500 hours", metaWatermark = "500 hours")
      val q = joined.writeStream.format("memory")
        .queryName(s"join_tort_$trial").outputMode("append").start()
      try {
        // random interleaving of the two sides over several batches
        val pShuffled = pages.sortBy(p => rnd(5, p.hashCode.abs % 100000))
        val mShuffled = metas.sortBy(m => rnd(6, m.hashCode.abs % 100000))
        val nb = 2 + (rnd(0, 3) % 3).toInt
        val pb = pShuffled.grouped(math.max(1, pShuffled.size / nb)).toSeq
        val mb = mShuffled.grouped(math.max(1, mShuffled.size / nb)).toSeq
        (0 until math.max(pb.size, mb.size)).foreach { k =>
          if (k < pb.size) pIn.addData(pb(k))
          if (k < mb.size) mIn.addData(mb(k))
          q.processAllAvailable()
        }
        val got = spark.table(s"join_tort_$trial")
          .select($"url", $"category").collect().map(_.toSeq).toSet
        val expected = pages.toDF().join(metas.toDF(), Seq("host"))
          .where(abs(unix_micros($"warc_ts") - unix_micros($"meta_ts")) <= bandUs)
          .select($"url", $"category").collect().map(_.toSeq).toSet
        assert(got == expected,
          s"trial $trial: stream-only=${(got -- expected).take(3)} " +
            s"batch-only=${(expected -- got).take(3)}")
        assert(expected.nonEmpty, s"trial $trial produced no joins — widen deltas")
      } finally q.stop()
    }
  }
}
