package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DecayedCounts
import graft.streaming.{ExactlyOnceSink, Trending}
import graft.streaming.Trending.Hit

/** Live epoch-decayed counters: watermark-final emission ≡ the batch
  * decayedSeries mirror, exactly-once across restarts, hard-zero gap
  * semantics, and the exactly-once-input composition. */
class TrendingSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L
  private val EpochUs = 100L * 1000000L // 100 s epochs

  /** epoch of a spec event placed at second `base + off`. */
  private def epochOf(off: Long): Long = (base + off) / 100L

  private def batchMirror(evs: Seq[Hit]) = {
    import spark.implicits._
    DecayedCounts.decayedSeries(
      evs.toDF().select($"key",
        floor(unix_timestamp($"ts") / 100).cast("long").as("e")),
      "key", "e")
  }

  test("hand sequence: out-of-order hits, gap shifts, watermark-final emission") {
    import spark.implicits._
    val in = MemoryStream[Hit](Encoders.product[Hit], spark)
    val q = Trending.scores(in.toDS().withWatermark("ts", "300 seconds"), EpochUs)
      .toDF().writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    // key a: 5 hits in epoch E, 2 in E+2, 7 in E+3 (delivered shuffled)
    val hits = Seq(10L, 20, 30, 40, 50).map(s => Hit("a", ts(base + s))) ++
      Seq(210L, 260).map(s => Hit("a", ts(base + s))) ++
      Seq(310L, 320, 330, 340, 350, 360, 370).map(s => Hit("a", ts(base + s)))
    try {
      in.addData(hits(7), hits(0), hits(5)); q.processAllAvailable()
      in.addData(hits.drop(8) ++ Seq(hits(6)) ++ hits.slice(1, 5): _*)
      q.processAllAvailable()
      in.addData(Hit("zz", ts(base + 9000))); q.processAllAvailable()
      in.addData(Hit("zz", ts(base + 20000))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trend_out").where($"key" === "a")
      .select($"epoch", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = epochOf(0)
    // 5 @E; (5>>2)+2=3 @E+2; (3>>1)+7=8 @E+3
    assert(got == Set((e, 5L), (e + 2, 3L), (e + 3, 8L)), got.toString)
  }

  test("randomized torture: stream ≡ decayedSeries with replays deduped upstream") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(9300 + seed)
      // unique (key, ts) so upstream dropDuplicatesWithinWatermark gives
      // the exactly-once input the counter requires (the documented
      // composition); all events inside 400 s << the 600 s delay
      val evs = rnd.shuffle((0 until 80).map(i =>
        Hit(s"k${rnd.nextInt(4)}", ts(base + i * 5 + rnd.nextInt(4)))))
        .distinct
      val replays = Seq.fill(12)(evs(rnd.nextInt(evs.length)))
      val feed = rnd.shuffle(evs ++ replays)
      val cp = Files.createTempDirectory(s"trd$seed").toString
      val table = Files.createTempDirectory(s"trdt$seed").toString
      val sink = new ExactlyOnceSink(table)
      val in = MemoryStream[Hit](Encoders.product[Hit], spark)
      val deduped = in.toDS().withWatermark("ts", "600 seconds")
        .dropDuplicatesWithinWatermark("key", "ts")
      val q = Trending.scores(deduped.as[Hit], EpochUs).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
      try {
        var rest: Seq[Hit] = feed
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(17)
          in.addData(rest.take(n): _*); q.processAllAvailable()
          rest = rest.drop(n)
        }
        in.addData(Hit("zz", ts(base + 9000))); q.processAllAvailable()
        in.addData(Hit("zz", ts(base + 30000))); q.processAllAvailable()
      } finally q.stop()
      val got = sink.read(spark).where($"key" =!= "zz")
        .select($"key", $"epoch", $"score").collect().map(_.toSeq).toSet
      val want = batchMirror(evs)
        .select($"key", $"epoch", $"score").collect().map(_.toSeq).toSet
      assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
    }
  }

  test("kill/resume: each (key, epoch) emitted exactly once across a restart") {
    import spark.implicits._
    val cp = Files.createTempDirectory("trkr").toString
    val table = Files.createTempDirectory("trkrt").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[Hit](Encoders.product[Hit], spark)
    def start() = Trending.scores(
        in.toDS().withWatermark("ts", "300 seconds"), EpochUs).toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
        sink.write(df.toDF(), i))
      .start()
    val evs = (0 until 30).map(i => Hit(if (i % 3 == 0) "a" else "b",
      ts(base + i * 25)))
    val q1 = start()
    try { in.addData(evs.take(12): _*); q1.processAllAvailable() }
    finally q1.stop() // kill with folded tail + pending epochs live
    val q2 = start()
    try {
      q2.processAllAvailable()
      in.addData(evs.drop(12): _*); q2.processAllAvailable()
      in.addData(Hit("zz", ts(base + 9000))); q2.processAllAvailable()
      in.addData(Hit("zz", ts(base + 30000))); q2.processAllAvailable()
    } finally q2.stop()
    val got = sink.read(spark).where($"key" =!= "zz")
      .select($"key", $"epoch", $"score").collect().map(_.toSeq)
    assert(got.size == got.toSet.size, "duplicate (key, epoch) rows after resume")
    val want = batchMirror(evs).select($"key", $"epoch", $"score")
      .collect().map(_.toSeq).toSet
    assert(got.toSet == want)
  }

  test("below-watermark hits are dropped; 63-epoch idle gap reads a hard zero") {
    import spark.implicits._
    val in = MemoryStream[Hit](Encoders.product[Hit], spark)
    val q = Trending.scores(in.toDS().withWatermark("ts", "100 seconds"), EpochUs)
      .toDF().writeStream.format("memory").queryName("trend_late")
      .outputMode("append").start()
    try {
      in.addData(Hit("a", ts(base + 10)), Hit("a", ts(base + 20)))
      q.processAllAvailable()
      // watermark is now base-80; push it far ahead, then send a straggler
      in.addData(Hit("zz", ts(base + 7000))); q.processAllAvailable()
      in.addData(Hit("a", ts(base + 30))) // below watermark: must not count
      q.processAllAvailable()
      // ancient-key return: > 63 epochs after its last activity (and
      // above the base+6900 watermark, so it is admitted)
      in.addData(Hit("a", ts(base + 6950))); q.processAllAvailable()
      in.addData(Hit("zz", ts(base + 30000))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trend_late").where($"key" === "a")
      .select($"epoch", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((epochOf(0), 2L), (epochOf(6950), 1L)), got.toString)
  }
}
