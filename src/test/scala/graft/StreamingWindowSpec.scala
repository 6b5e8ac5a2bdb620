package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Windows
import graft.streaming.Sessionize.PageLite

/** Streaming tumbling/sliding window aggregations match batch semantics. */
class StreamingWindowSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L // aligned to hour boundaries below

  private val rows = Seq(
    PageLite("a.example", ts(base), 10),
    PageLite("a.example", ts(base + 1700), 11),
    PageLite("b.example", ts(base + 3000), 12),
    PageLite("a.example", ts(base + 4200), 13),
    PageLite("b.example", ts(base + 7300), 14))

  test("streaming tumbling window equals batch window aggregation") {
    import spark.implicits._
    val input = MemoryStream[PageLite](Encoders.product[PageLite], spark)
    val agg = input.toDF()
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window($"warc_ts", "1 hour"), $"host")
      .agg(count(lit(1)).as("n"), sum($"text_len").as("bytes"))
      .select($"host", unix_micros($"window.start".cast("timestamp")).as("w_start"),
        $"n", $"bytes")
    val q = agg.writeStream.format("memory").queryName("tumb_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(3)); q.processAllAvailable()
      input.addData(rows.drop(3)); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 100000), 0)); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 200000), 0)); q.processAllAvailable()
      val got = spark.table("tumb_out").where($"host" =!= "zz.flush")
        .collect().map(_.toSeq).toSet
      val batch = Windows.tumbling(rows.toDF(), "warc_ts", "1 hour",
        Seq($"host"), Seq(count(lit(1)).as("n"), sum($"text_len").as("bytes")))
        .select($"host", $"w_start", $"n", $"bytes")
        .collect().map(_.toSeq).toSet
      assert(got == batch, s"stream=$got\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming sliding window assigns each row to two 1h/30m windows") {
    import spark.implicits._
    val input = MemoryStream[PageLite](Encoders.product[PageLite], spark)
    val agg = input.toDF()
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window($"warc_ts", "1 hour", "30 minutes"), $"host")
      .agg(count(lit(1)).as("n"))
      .select($"host", unix_micros($"window.start".cast("timestamp")).as("w_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    try {
      input.addData(rows); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 100000), 0)); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 200000), 0)); q.processAllAvailable()
      val got = spark.table("slide_out").where($"host" =!= "zz.flush")
        .agg(sum($"n")).collect()(0).getLong(0)
      assert(got == rows.size * 2, s"each row in exactly 2 windows, got $got")
      val batch = Windows.sliding(rows.toDF(), "warc_ts", "1 hour", "30 minutes",
        Seq($"host"), Seq(count(lit(1)).as("n")))
        .select($"host", $"w_start", $"n").collect().map(_.toSeq).toSet
      val gotRows = spark.table("slide_out").where($"host" =!= "zz.flush")
        .collect().map(_.toSeq).toSet
      assert(gotRows == batch)
    } finally q.stop()
  }

  test("streaming windowed top-k via the TopK UDAF matches batch ranking") {
    import spark.implicits._
    val topk = graft.operators.TopK.topKUdaf(2)
    val input = MemoryStream[PageLite](Encoders.product[PageLite], spark)
    // per 1h window: top-2 rows by text_len (custom typed Aggregator
    // inside a watermarked streaming aggregation — partial top-k buffers
    // merge across micro-batches and partitions, like the batch plan)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"warc_ts", "1 hour"))
      .agg(topk(hash($"host").cast("long"), $"text_len").as("top"))
      .select(unix_micros($"window.start".cast("timestamp")).as("w_start"),
        posexplode($"top"))
      .select($"w_start", $"pos", $"col.id", $"col.score")
    val q = shape(input.toDF().withWatermark("warc_ts", "10 minutes"))
      .writeStream.format("memory").queryName("wtopk_out")
      .outputMode("append").start()
    try {
      // two batches so the per-window buffer MERGES across micro-batches
      input.addData(rows.take(2)); q.processAllAvailable()
      input.addData(rows.drop(2)); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 100000), 0)); q.processAllAvailable()
      input.addData(PageLite("zz.flush", ts(base + 200000), 0)); q.processAllAvailable()
      val flushIds = Set(spark.range(1)
        .select(hash(lit("zz.flush")).cast("long")).collect()(0).getLong(0))
      val got = spark.table("wtopk_out").collect().map(_.toSeq).toSet
        .filterNot(r => flushIds.contains(r(2).asInstanceOf[Long]))
      val batch = shape(rows.toDF()).collect().map(_.toSeq).toSet
      assert(got == batch && got.nonEmpty, s"stream=$got\nbatch=$batch")
    } finally q.stop()
  }

  test("flagship entry returns non-empty per-host rollup") {
    val df = SparkEntry.entry(spark)
    val n = df.count()
    assert(n > 0 && n <= 30, s"expected per-host rows, got $n")
    assert(df.columns.toSet == Set("host", "n_sessions", "n_pages", "text_chars"))
  }
}
