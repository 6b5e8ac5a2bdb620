package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ExactlyOnceSink, SequentialPairs}
import graft.streaming.SequentialPairs.SeqEv

/**
 * Streaming successor pairing (the live OpticalFlow shape): every event
 * pairs with its event-time predecessor per key, watermark-final,
 * identical to the batch `lag` mirror on any delivery order.
 */
class SequentialPairsSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L

  test("streaming pairs equal the batch lag mirror; out-of-order delivery") {
    import spark.implicits._
    val in = MemoryStream[SeqEv](Encoders.product[SeqEv], spark)
    val q = SequentialPairs.pairs(spark, in.toDS(), "300 seconds").toDF()
      .writeStream.format("memory").queryName("succ_out")
      .outputMode("append").start()
    val evs = Seq(
      SeqEv("a", ts(base + 10), 1, 100), SeqEv("a", ts(base + 30), 2, 140),
      SeqEv("a", ts(base + 20), 3, 90), // out of order, lands between
      SeqEv("b", ts(base + 15), 4, 50), SeqEv("b", ts(base + 45), 5, 70))
    try {
      in.addData(evs(0), evs(1)); q.processAllAvailable()
      in.addData(evs(2), evs(3), evs(4)); q.processAllAvailable()
      // flush far past every deadline
      in.addData(SeqEv("zz", ts(base + 5000), 900, 0)); q.processAllAvailable()
      in.addData(SeqEv("zz", ts(base + 9000), 901, 0)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("succ_out").where($"key" =!= "zz")
      .select($"key", $"prev_id", $"id", $"flow")
      .collect().map(_.toSeq).toSet
    // a: 1 -> 3 -> 2 in (ts, id) order; b: 4 -> 5
    assert(got == Set(Seq("a", 1L, 3L, -10L), Seq("a", 3L, 2L, 50L),
      Seq("b", 4L, 5L, 20L)), got.toString)
  }

  test("randomized torture: pairs ≡ batch mirror over random batches with replays") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(8100 + seed)
      // events inside a 200s window (< the 300s delay: nothing is below
      // the watermark mid-stream); unique (key, ts) so the (ts, id)
      // order is unambiguous under replays
      var id = 0L
      val evs = rnd.shuffle((0 until 50).map { i =>
        id += 1
        SeqEv(s"k${rnd.nextInt(3)}", ts(base + i * 4 + rnd.nextInt(3)), id,
          rnd.nextInt(1000).toLong)
      })
      val replays = Seq.fill(8)(evs(rnd.nextInt(evs.length)))
      val feed = rnd.shuffle(evs ++ replays)

      val cp = Files.createTempDirectory(s"sqp$seed").toString
      val table = Files.createTempDirectory(s"sqpt$seed").toString
      val sink = new ExactlyOnceSink(table)
      val in = MemoryStream[SeqEv](Encoders.product[SeqEv], spark)
      val q = SequentialPairs.pairs(spark, in.toDS(), "300 seconds").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
      try {
        var rest: Seq[SeqEv] = feed
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(15)
          in.addData(rest.take(n): _*)
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        in.addData(SeqEv("zz", ts(base + 5000), 900, 0)); q.processAllAvailable()
        in.addData(SeqEv("zz", ts(base + 9000), 901, 0)); q.processAllAvailable()
      } finally q.stop()
      val got = sink.read(spark).where($"key" =!= "zz")
        .select($"key", $"prev_id", $"id", $"flow")
        .collect().map(_.toSeq).toSet
      val expected = SequentialPairs.pairsBatch(evs.toDF(),
        "key", "ts", "id", "len")
        .select($"key", $"prev_id", $"id", $"flow")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"seed $seed: got ${got.size} expected ${expected.size}")
    }
  }

  test("kill/resume: pairing is exactly-once across a restart") {
    import spark.implicits._
    val cp = Files.createTempDirectory("sqkr").toString
    val table = Files.createTempDirectory("sqkrt").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[SeqEv](Encoders.product[SeqEv], spark)
    def start() =
      SequentialPairs.pairs(spark, in.toDS(), "300 seconds").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
    val q1 = start()
    val evs = (0 until 20).map(i => SeqEv("a", ts(base + i * 10), i.toLong, i * 7L))
    try {
      in.addData(evs.take(10): _*); q1.processAllAvailable()
    } finally q1.stop() // kill mid-stream: bridge + pending must survive
    val q2 = start()
    try {
      q2.processAllAvailable()
      in.addData(evs.drop(10): _*); q2.processAllAvailable()
      in.addData(SeqEv("zz", ts(base + 5000), 900, 0)); q2.processAllAvailable()
      in.addData(SeqEv("zz", ts(base + 9000), 901, 0)); q2.processAllAvailable()
    } finally q2.stop()
    val got = sink.read(spark).where($"key" =!= "zz")
      .select($"prev_id", $"id", $"flow").collect().map(_.toSeq).toSet
    val want = SequentialPairs.pairsBatch(evs.toDF(), "key", "ts", "id", "len")
      .select($"prev_id", $"id", $"flow").collect().map(_.toSeq).toSet
    assert(got == want && got.size == 19)
  }
}
