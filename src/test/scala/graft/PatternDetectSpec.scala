package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit

import graft.streaming.{ExactlyOnceSink, PatternDetect}
import graft.streaming.PatternDetect.Ev

/** CEP sequence pattern: streaming == batch mirror, out-of-order safe,
  * kill/resume safe. */
class PatternDetectSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1700000000L

  test("streaming first-match equals batch mirror; survives out-of-order and resume") {
    import spark.implicits._
    val cp = Files.createTempDirectory("pdcp").toString
    val table = Files.createTempDirectory("pdtbl").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[Ev](Encoders.product[Ev], spark)

    def start() = PatternDetect.sequence(spark, in.toDS(),
        aKind = "view", bKind = "buy", withinSec = 600L,
        watermarkDelay = "300 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((ds: org.apache.spark.sql.Dataset[PatternDetect.Match], id: Long) =>
        sink.write(ds.toDF(), id))
      .start()

    val rows = scala.collection.mutable.ArrayBuffer[Ev]()
    def add(q: org.apache.spark.sql.streaming.StreamingQuery, es: Ev*): Unit = {
      rows ++= es; in.addData(es: _*); q.processAllAvailable()
    }

    var q = start()
    // key 1: A at t0; B arrives in the same batch; a second A arrives in a
    // LATER batch but out of order (event time before the B already seen)
    add(q, Ev(1, ts(base), "view", 10), Ev(1, ts(base + 400), "buy", 20))
    add(q, Ev(1, ts(base + 350), "view", 11)) // above watermark (base+100)
    // key 2: A with no B inside the window; B far outside
    add(q, Ev(2, ts(base), "view", 30), Ev(2, ts(base + 700), "buy", 40))
    q.stop() // kill mid-pattern

    q = start() // resume: open A state must survive
    // advance the watermark far past every deadline so all matches emit
    add(q, Ev(1, ts(base + 5000), "view", 99), Ev(2, ts(base + 5000), "view", 98))
    add(q, Ev(1, ts(base + 9000), "view", 97), Ev(2, ts(base + 9000), "view", 96))
    q.processAllAvailable()
    q.stop()

    val got = sink.read(spark)
      .select($"key", $"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // both key-1 views match buy 20 (first B in window, not consumed);
    // key-2's buy at +700s is outside the 600s window
    assert(got == Set((1L, 10L, 20L), (1L, 11L, 20L)), s"got $got")

    // batch mirror agrees on the full input
    val batch = PatternDetect.sequenceBatch(rows.toSeq.toDF(),
        "key", "ts", "kind", "id", "view", "buy", 600L)
      .select($"key", $"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // streaming emitted only patterns whose deadline the final watermark
    // passed; every emitted match must appear in the batch result
    assert(got.subsetOf(batch), s"streaming=$got batch=$batch")
    assert(batch.filterNot(_._2 >= 96) == got, s"ripe matches differ: $batch vs $got")
  }

  test("randomized torture: sequence/absence ≡ batch mirrors over random batches with replays") {
    import spark.implicits._
    val within = 60L
    val delay = "300 seconds"
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(7000 + seed)
      // events inside a 200s window (< the 300s delay, so nothing is ever
      // below the watermark mid-stream); duplicate (ts,id) replays across
      // batches stress the sorted-state merge-union dedupe
      val evs = scala.collection.mutable.ArrayBuffer[Ev]()
      var id = 0L
      (0 until 60).foreach { _ =>
        id += 1
        evs += Ev(rnd.nextInt(3).toLong, ts(base + rnd.nextInt(200)),
          Seq("view", "buy", "zz")(rnd.nextInt(3)), id)
      }
      val replays = Seq.fill(10)(evs(rnd.nextInt(evs.length)))
      val feed = rnd.shuffle((evs ++ replays).toSeq)

      def run(absence: Boolean): Set[Seq[Any]] = {
        val cp = Files.createTempDirectory(s"pdt$seed").toString
        val table = Files.createTempDirectory(s"pdtt$seed").toString
        val sink = new ExactlyOnceSink(table)
        val in = MemoryStream[Ev](Encoders.product[Ev], spark)
        val out = if (absence)
          PatternDetect.absence(spark, in.toDS(), "view", "buy", within, delay).toDF()
        else
          PatternDetect.sequence(spark, in.toDS(), "view", "buy", within, delay).toDF()
        val q = out.writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
            sink.write(df.toDF(), i))
          .start()
        // random batch splits
        var rest = feed
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(20)
          in.addData(rest.take(n): _*)
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        // flush: neutral kind far in the future ripens every deadline
        in.addData(Ev(0, ts(base + 5000), "zz", 9001))
        q.processAllAvailable()
        in.addData(Ev(0, ts(base + 9000), "zz", 9002))
        q.processAllAvailable()
        q.stop()
        val cols = if (absence) Seq($"key", $"a_id") else Seq($"key", $"a_id", $"b_id")
        sink.read(spark).select(cols: _*).collect().map(_.toSeq).toSet
      }

      val allRows = evs.toSeq.distinct.toDF()
      val seqExpected = PatternDetect.sequenceBatch(allRows,
        "key", "ts", "kind", "id", "view", "buy", within)
        .select($"key", $"a_id", $"b_id").collect().map(_.toSeq).toSet
      val seqGot = run(absence = false)
      assert(seqGot == seqExpected, s"seed $seed sequence: got $seqGot expected $seqExpected")

      val absExpected = PatternDetect.absenceBatch(allRows,
        "key", "ts", "kind", "id", "view", "buy", within)
        .select($"key", $"a_id").collect().map(_.toSeq).toSet
      val absGot = run(absence = true)
      assert(absGot == absExpected, s"seed $seed absence: got $absGot expected $absExpected")
    }
  }

  test("randomized torture: sequence3/quiescence ≡ batch mirrors over random batches with replays") {
    import spark.implicits._
    val w = 60L
    val delay = "300 seconds"
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(8000 + seed)
      val evs = scala.collection.mutable.ArrayBuffer[Ev]()
      var id = 0L
      (0 until 60).foreach { _ =>
        id += 1
        evs += Ev(rnd.nextInt(3).toLong, ts(base + rnd.nextInt(200)),
          Seq("view", "buy", "pay", "zz")(rnd.nextInt(4)), id)
      }
      val replays = Seq.fill(10)(evs(rnd.nextInt(evs.length)))
      val feed = rnd.shuffle((evs ++ replays).toSeq)
      val flush = Seq(Ev(0, ts(base + 5000), "zz", 9001), Ev(0, ts(base + 9000), "zz", 9002))

      def run(quiesce: Boolean): Set[Seq[Any]] = {
        val cp = Files.createTempDirectory(s"pd3$seed").toString
        val table = Files.createTempDirectory(s"pd3t$seed").toString
        val sink = new ExactlyOnceSink(table)
        val in = MemoryStream[Ev](Encoders.product[Ev], spark)
        val out = if (quiesce)
          PatternDetect.quiescence(spark, in.toDS(), w, delay).toDF()
        else
          PatternDetect.sequence3(spark, in.toDS(), "view", "buy", "pay", w, w, delay).toDF()
        val q = out.writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
            sink.write(df.toDF(), i))
          .start()
        var rest = feed
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(20)
          in.addData(rest.take(n): _*)
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        flush.foreach { e => in.addData(e); q.processAllAvailable() }
        q.stop()
        val cols = if (quiesce) Seq($"key", $"a_id") else Seq($"key", $"a_id", $"b_id", $"c_id")
        sink.read(spark).select(cols: _*).collect().map(_.toSeq).toSet
      }

      val allRows = evs.toSeq.distinct.toDF()
      val s3Expected = PatternDetect.sequence3Batch(allRows,
        "key", "ts", "kind", "id", "view", "buy", "pay", w, w)
        .select($"key", $"a_id", $"b_id", $"c_id").collect().map(_.toSeq).toSet
      val s3Got = run(quiesce = false)
      assert(s3Got == s3Expected, s"seed $seed sequence3: got $s3Got expected $s3Expected")

      // quiescence sees the flush events too (every event plays both
      // roles); the second flush event's own deadline never ripens
      val quiExpected = PatternDetect.quiescenceBatch(
        (evs.toSeq.distinct ++ flush).toDF(), "key", "ts", "id", w)
        .select($"key", $"a_id").collect().map(_.toSeq).toSet
        .filterNot(_(1) == 9002L)
      val quiGot = run(quiesce = true)
      assert(quiGot == quiExpected, s"seed $seed quiescence: got $quiGot expected $quiExpected")
    }
  }

  test("absence pattern: A with no B in window emits exactly once, at the watermark") {
    import spark.implicits._
    val cp = Files.createTempDirectory("abcp").toString
    val table = Files.createTempDirectory("abtbl").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[Ev](Encoders.product[Ev], spark)

    def start() = PatternDetect.absence(spark, in.toDS(),
        aKind = "view", bKind = "buy", withinSec = 600L,
        watermarkDelay = "300 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((ds: org.apache.spark.sql.Dataset[PatternDetect.Absent], id: Long) =>
        sink.write(ds.toDF(), id))
      .start()

    val rows = scala.collection.mutable.ArrayBuffer[Ev]()
    def add(q: org.apache.spark.sql.streaming.StreamingQuery, es: Ev*): Unit = {
      rows ++= es; in.addData(es: _*); q.processAllAvailable()
    }

    var q = start()
    // key 1: view 10 gets a buy inside the window (NOT emitted);
    // view 11 has no buy (emitted). key 2: buy arrives 700s later,
    // outside the 600s window -> emitted. All event times stay above the
    // advancing watermark (maxTs - 300s) so no row is late-dropped.
    add(q, Ev(1, ts(base), "view", 10), Ev(1, ts(base + 400), "buy", 20))
    add(q, Ev(1, ts(base + 450), "view", 11))
    add(q, Ev(2, ts(base + 500), "view", 30), Ev(2, ts(base + 1200), "buy", 40))
    q.stop() // kill before any deadline passes

    q = start() // resume; advance the watermark past all deadlines
    add(q, Ev(1, ts(base + 5000), "view", 99), Ev(2, ts(base + 5000), "view", 98))
    add(q, Ev(1, ts(base + 9000), "view", 97), Ev(2, ts(base + 9000), "view", 96))
    q.processAllAvailable()
    q.stop()

    val got = sink.read(spark).select($"key", $"a_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the watermark-advancing views 98/99 are themselves B-less and ripe
    // by the end — they are genuine absences too
    assert(got == Set((1L, 11L), (2L, 30L), (1L, 99L), (2L, 98L)), s"got $got")

    // the batch mirror agrees on the ripe subset (96/97 never ripened)
    val batch = PatternDetect.absenceBatch(rows.toSeq.toDF(),
        "key", "ts", "kind", "id", "view", "buy", 600L)
      .select($"key", $"a_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.filterNot(p => p._2 == 96L || p._2 == 97L) == got,
      s"batch=$batch got=$got")
  }

  test("kleene A B+ C: run counting, reluctant close, strict leg order, window edges") {
    import spark.implicits._
    val rows = Seq(
      // key 1: A, three B's, C — run of 3
      Ev(1, ts(base), "a", 1), Ev(1, ts(base + 10), "b", 2), Ev(1, ts(base + 20), "b", 3),
      Ev(1, ts(base + 30), "b", 4), Ev(1, ts(base + 40), "c", 5),
      // key 2: B's but no C inside the window -> nothing
      Ev(2, ts(base), "a", 6), Ev(2, ts(base + 10), "b", 7), Ev(2, ts(base + 700), "c", 8),
      // key 3: C before any B -> the later C closes (first C AFTER first B)
      Ev(3, ts(base), "a", 9), Ev(3, ts(base + 5), "c", 10), Ev(3, ts(base + 10), "b", 11),
      Ev(3, ts(base + 20), "c", 12), Ev(3, ts(base + 30), "b", 13),
      // key 4: B at the same timestamp as C is NOT part of the run (strict <)
      Ev(4, ts(base), "a", 14), Ev(4, ts(base + 10), "b", 15), Ev(4, ts(base + 20), "b", 16),
      Ev(4, ts(base + 20), "c", 17),
      // key 5: C exactly at a_ts + w is still in-window
      Ev(5, ts(base), "a", 18), Ev(5, ts(base + 10), "b", 19), Ev(5, ts(base + 600), "c", 20),
      // key 6: no B at all -> nothing, despite a C
      Ev(6, ts(base), "a", 21), Ev(6, ts(base + 10), "c", 22)
    ).toDF()
    val got = PatternDetect.kleeneBatch(rows, "key", "ts", "kind", "id",
        "a", "b", "c", withinSec = 600L)
      .select($"key", $"a_id", $"b_count", $"b_first_id", $"b_last_id", $"c_id")
      .collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq(1L, 1L, 3L, 2L, 4L, 5L),   // full run of 3
      Seq(3L, 9L, 1L, 11L, 11L, 12L), // reluctant: c=12 (first after b=11), run = {11}
      Seq(4L, 14L, 1L, 15L, 15L, 17L), // b=16 at c's ts excluded from the run
      Seq(5L, 18L, 1L, 19L, 19L, 20L)  // boundary C included
    ), s"got $got")
  }

  test("randomized torture: kleene ≡ batch mirror over random batches with replays") {
    import spark.implicits._
    val w = 60L
    val delay = "300 seconds"
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(9100 + seed)
      val evs = scala.collection.mutable.ArrayBuffer[Ev]()
      var id = 0L
      (0 until 60).foreach { _ =>
        id += 1
        evs += Ev(rnd.nextInt(3).toLong, ts(base + rnd.nextInt(200)),
          Seq("view", "buy", "pay", "zz")(rnd.nextInt(4)), id)
      }
      val replays = Seq.fill(10)(evs(rnd.nextInt(evs.length)))
      val feed = rnd.shuffle((evs ++ replays).toSeq)
      val flush = Seq(Ev(0, ts(base + 5000), "zz", 9001))

      val cp = Files.createTempDirectory(s"pdk$seed").toString
      val table = Files.createTempDirectory(s"pdkt$seed").toString
      val sink = new ExactlyOnceSink(table)
      val in = MemoryStream[Ev](Encoders.product[Ev], spark)
      val out = PatternDetect.kleene(spark, in.toDS(), "view", "buy", "pay", w, delay).toDF()
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], i: Long) =>
          sink.write(df.toDF(), i))
        .start()
      var rest = feed
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(20)
        in.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      flush.foreach { e => in.addData(e); q.processAllAvailable() }
      q.stop()
      val got = sink.read(spark)
        .select($"key", $"a_id", $"b_count", $"b_first_id", $"b_last_id", $"c_id")
        .collect().map(_.toSeq).toSet
      val expected = PatternDetect.kleeneBatch(evs.toSeq.distinct.toDF(),
          "key", "ts", "kind", "id", "view", "buy", "pay", w)
        .select($"key", $"a_id", $"b_count", $"b_first_id", $"b_last_id", $"c_id")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"seed $seed kleene: got $got expected $expected")
    }
  }

  test("patterns compose into longer chains: (A->B) then ->C via two passes") {
    import spark.implicits._
    // 3-leg chain A->B->C = sequence(A,B), re-keyed as a synthetic event
    // at the B's time, then sequence(that, C) — the composition every
    // longer MATCH_RECOGNIZE chain reduces to (batch form; the streaming
    // form chains the same two operators)
    val rows = Seq(
      Ev(1, ts(base), "a", 1), Ev(1, ts(base + 100), "b", 2), Ev(1, ts(base + 200), "c", 3),
      Ev(2, ts(base), "a", 4), Ev(2, ts(base + 100), "b", 5), // no c for key 2
      Ev(3, ts(base), "a", 6), Ev(3, ts(base + 2000), "b", 7), Ev(3, ts(base + 2100), "c", 8)
    ).toDF() // key 3's b is outside a->b window
    val ab = PatternDetect.sequenceBatch(rows, "key", "ts", "kind", "id",
        "a", "b", withinSec = 600L)
      .select($"key", $"a_id", ($"b_us" / 1000000).cast("timestamp").as("ts"),
        lit("ab").as("kind"), $"b_id".as("id"))
    val abc = PatternDetect.sequenceBatch(
        ab.select($"key", $"ts", $"kind", $"id")
          .union(rows.where($"kind" === "c").select($"key", $"ts", $"kind", $"id")),
        "key", "ts", "kind", "id", "ab", "c", withinSec = 600L)
      .select($"key", $"a_id".as("b_id"), $"b_id".as("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only key 1 completes the full a->b->c chain
    assert(abc == Set((1L, 2L, 3L)), s"got $abc")
  }
}
