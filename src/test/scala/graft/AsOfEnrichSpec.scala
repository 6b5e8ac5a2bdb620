package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.streaming.{AsOfEnrich, ExactlyOnceSink}
import graft.streaming.AsOfEnrich.{AsOfEv, AsOfSnap}

/**
 * Streaming as-of enrichment: every event picks up the newest snapshot at
 * or before its event time, watermark-final, identical to the batch
 * [[AsOfJoin]] mirror on any delivery order, across kill/resume.
 */
class AsOfEnrichSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L

  private def mirror(evs: Seq[AsOfEv], sns: Seq[AsOfSnap]): Set[Seq[Any]] = {
    import spark.implicits._
    val l = evs.toDF("key", "ts", "id")
    val r = sns.toDF("key", "ts", "sval")
      .select($"key", $"ts", unix_micros($"ts").as("snap_us"), $"sval")
    AsOfJoin.asOf(l, r, Seq("key"), "ts", "ts")
      .select($"key", $"id", unix_micros($"ts").as("ts_us"), $"snap_us", $"sval")
      .collect().map(_.toSeq).toSet
  }

  private def gotRows(df: DataFrame): Set[Seq[Any]] = {
    import spark.implicits._
    df.where($"key" =!= "zz")
      .select($"key", $"id", unix_micros($"ts").as("ts_us"),
        unix_micros($"snap_ts").as("snap_us"), $"sval")
      .collect().map(_.toSeq).toSet
  }

  test("basic: latest-at-or-before match, tie visible, no-match NULL, out-of-order") {
    import spark.implicits._
    val ev = MemoryStream[AsOfEv](Encoders.product[AsOfEv], spark)
    val sn = MemoryStream[AsOfSnap](Encoders.product[AsOfSnap], spark)
    val q = AsOfEnrich.enrich(spark, ev.toDS(), sn.toDS(), "300 seconds").toDF()
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      ev.addData(AsOfEv("a", ts(base + 50), 1), AsOfEv("a", ts(base + 10), 2))
      sn.addData(AsOfSnap("a", ts(base + 50), 7L)) // equal-ts: visible to id 1
      q.processAllAvailable()
      sn.addData(AsOfSnap("a", ts(base + 20), 5L)) // out of order, matches nothing emitted yet
      q.processAllAvailable()
      ev.addData(AsOfEv("a", ts(base + 60), 3))
      ev.addData(AsOfEv("zz", ts(base + 5000), 900)); q.processAllAvailable()
      ev.addData(AsOfEv("zz", ts(base + 9000), 901)); q.processAllAvailable()
    } finally q.stop()
    val got = gotRows(spark.table("asof_out"))
    val want = mirror(
      Seq(AsOfEv("a", ts(base + 50), 1), AsOfEv("a", ts(base + 10), 2),
        AsOfEv("a", ts(base + 60), 3)),
      Seq(AsOfSnap("a", ts(base + 50), 7L), AsOfSnap("a", ts(base + 20), 5L)))
    assert(got == want, s"got $got want $want")
    // and the mirror itself says: id2 unmatched, id1 equal-ts 7, id3 latest 7
    assert(want.exists(r => r(1) == 2L && r(4) == null))
    assert(want.exists(r => r(1) == 1L && r(4) == 7L))
  }

  test("randomized torture: stream ≡ batch mirror over random batches with replays") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(9300 + seed)
      // all rows inside a 200s window (< the 300s delay): nothing is
      // below the watermark mid-stream; unique ts per key/side keeps the
      // max-struct rule from being the only disambiguator
      var id = 0L
      val evs = (0 until 40).map { i =>
        id += 1
        AsOfEv(s"k${rnd.nextInt(3)}", ts(base + i * 5 + rnd.nextInt(4)), id)
      }
      val sns = (0 until 30).map { i =>
        AsOfSnap(s"k${rnd.nextInt(3)}", ts(base + i * 6 + rnd.nextInt(5)),
          rnd.nextInt(100).toLong)
      }
      val feed: Seq[Either[AsOfEv, AsOfSnap]] = rnd.shuffle(
        evs.map(Left(_)) ++ sns.map(Right(_)) ++
          Seq.fill(6)(evs(rnd.nextInt(evs.length))).map(Left(_)) ++
          Seq.fill(6)(sns(rnd.nextInt(sns.length))).map(Right(_)))

      val cp = Files.createTempDirectory(s"asof$seed").toString
      val table = Files.createTempDirectory(s"asoft$seed").toString
      val sink = new ExactlyOnceSink(table)
      val ev = MemoryStream[AsOfEv](Encoders.product[AsOfEv], spark)
      val sn = MemoryStream[AsOfSnap](Encoders.product[AsOfSnap], spark)
      val q = AsOfEnrich.enrich(spark, ev.toDS(), sn.toDS(), "300 seconds").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
      try {
        var rest = feed
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(12)
          rest.take(n).foreach {
            case Left(e) => ev.addData(e)
            case Right(s0) => sn.addData(s0)
          }
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        ev.addData(AsOfEv("zz", ts(base + 5000), 900)); q.processAllAvailable()
        ev.addData(AsOfEv("zz", ts(base + 9000), 901)); q.processAllAvailable()
      } finally q.stop()
      val got = gotRows(sink.read(spark))
      val want = mirror(evs, sns)
      assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
    }
  }

  test("kill/resume: enrichment is exactly-once across a restart") {
    import spark.implicits._
    val cp = Files.createTempDirectory("asofkr").toString
    val table = Files.createTempDirectory("asofkrt").toString
    val sink = new ExactlyOnceSink(table)
    val ev = MemoryStream[AsOfEv](Encoders.product[AsOfEv], spark)
    val sn = MemoryStream[AsOfSnap](Encoders.product[AsOfSnap], spark)
    def start() =
      AsOfEnrich.enrich(spark, ev.toDS(), sn.toDS(), "300 seconds").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
    val evs = (0 until 20).map(i => AsOfEv("a", ts(base + i * 10), i.toLong))
    val sns = (0 until 10).map(i => AsOfSnap("a", ts(base + i * 21), i * 3L))
    val q1 = start()
    try {
      ev.addData(evs.take(10): _*); sn.addData(sns.take(5): _*)
      q1.processAllAvailable()
    } finally q1.stop() // kill mid-stream: bridge + both buffers must survive
    val q2 = start()
    try {
      q2.processAllAvailable()
      ev.addData(evs.drop(10): _*); sn.addData(sns.drop(5): _*)
      q2.processAllAvailable()
      ev.addData(AsOfEv("zz", ts(base + 5000), 900)); q2.processAllAvailable()
      ev.addData(AsOfEv("zz", ts(base + 9000), 901)); q2.processAllAvailable()
    } finally q2.stop()
    val got = gotRows(sink.read(spark))
    val want = mirror(evs, sns)
    assert(got == want && got.size == 20, s"got ${got.size}")
  }
}
