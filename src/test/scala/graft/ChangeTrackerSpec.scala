package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.UrlOps
import graft.streaming.ChangeTracker
import graft.streaming.ChangeTracker.Arrival

/** Live per-URL change tracking: cumulative watermark-final emission,
  * newest-row serving read ≡ the batch changeFrequency rollup over the
  * finalized prefix, out-of-order delivery, and null-fp parity. */
class ChangeTrackerSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L

  private def batchMirror(evs: Seq[Arrival]) = {
    import spark.implicits._
    UrlOps.changeFrequency(
      evs.toDF().select($"url", $"ts", $"tie", $"fp"),
      "url", "ts", "fp", "tie")
      .as[(String, Long, Long, Long)].collect().toSet
  }

  test("hand sequence: finality order, cumulative rows, null-fp change, single crawl") {
    import spark.implicits._
    val in = MemoryStream[Arrival](Encoders.product[Arrival], spark)
    val q = ChangeTracker.track(
      in.toDS().withWatermark("ts", "100 seconds"))
      .toDF().writeStream.format("memory").queryName("chg_out")
      .outputMode("append").start()
    // u1: a @10, a @20, b @30, NULL @40, b @50 -> changes at 30, 40, 50
    val u1 = Seq(("u1", 10L, 1L, "a"), ("u1", 20L, 2L, "a"),
      ("u1", 30L, 3L, "b"), ("u1", 40L, 4L, null), ("u1", 50L, 5L, "b"))
      .map { case (u, s, t, f) => Arrival(u, ts(base + s), t, f) }
    try {
      // deliver shuffled; nothing final until the watermark moves
      in.addData(u1(2), u1(0), u1(4), u1(1), u1(3)); q.processAllAvailable()
      // push the watermark past every u1 arrival, then past the pusher
      in.addData(Arrival("u2", ts(base + 400), 9L, "x")); q.processAllAvailable()
      in.addData(Arrival("u2", ts(base + 900), 10L, "x")); q.processAllAvailable()
      in.addData(Arrival("zz", ts(base + 2000), 11L, "z")); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("chg_out")
      .as[(String, Long, Long, Long)].collect().toSeq
    // newest (highest n_crawls) row per url is the serving truth
    val newest = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
    assert(newest.contains(("u1", 5L, 3L, 750L)), rows.toString)
    assert(newest.contains(("u2", 2L, 0L, 0L)), rows.toString)
    // cumulative rows are monotone in (n_crawls, n_changes) per url
    for ((_, rs) <- rows.groupBy(_._1)) {
      val byCrawls = rs.sortBy(_._2)
      assert(byCrawls.map(_._3) == byCrawls.map(_._3).sorted, rows.toString)
    }
  }

  test("randomized torture: newest rows ≡ batch changeFrequency over the finalized prefix") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(12400 + seed)
      val evs = (0 until 90).map { i =>
        Arrival(s"u${rnd.nextInt(5)}", ts(base + i * 3 + rnd.nextInt(2)),
          i.toLong, if (rnd.nextInt(4) == 0) null else s"v${rnd.nextInt(3)}")
      }
      val in = MemoryStream[Arrival](Encoders.product[Arrival], spark)
      val name = s"chg_t$seed"
      // 400 s delay > the 270 s event span: shuffled delivery can never
      // make an event late, so the stream must see ALL of them and the
      // batch mirror over the full set is the exact truth
      val q = ChangeTracker.track(
        in.toDS().withWatermark("ts", "400 seconds"))
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // one far-future pusher finalizes everything
      val pusher = Arrival("push", ts(base + 100000), 9999L, "p")
      try {
        rnd.shuffle(evs).grouped(23).foreach { chunk =>
          in.addData(chunk: _*); q.processAllAvailable()
        }
        in.addData(pusher); q.processAllAvailable()
        in.addData(Arrival("push2", ts(base + 200000), 10000L, "p"))
        q.processAllAvailable()
      } finally q.stop()
      val newest = spark.table(name).as[(String, Long, Long, Long)]
        .collect().groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
      // with nothing ever late (delay > span), the stream folds every
      // event, so the batch mirror over the full set (+ pusher) is exact
      val want = batchMirror(evs :+ pusher)
        .filter(r => r._1 != "push2") // final pusher may not have folded
      val gotCmp = newest.filter(_._1 != "push2")
      assert(gotCmp == want, s"seed $seed: $gotCmp vs $want")
    }
  }
}
