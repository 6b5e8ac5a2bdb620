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

  test("rowwise MinHashBandSigs equals the explode+min-agg minhashBands") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"band".cast("long"), $"sig")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val agg = rows(graft.operators.Dedup.minhashBands(docs, "doc_id", "text", n = 3, bands = 8))
    val rww = rows(graft.operators.Dedup.minhashBandsRowwise(docs, "doc_id", "text", n = 3, bands = 8))
    assert(agg == rww, s"rowwise != agg: only-agg=${(agg -- rww).take(3)} only-rowwise=${(rww -- agg).take(3)}")
    assert(agg.nonEmpty)
  }

  test("rowwise sigs equal agg sigs on adversarial whitespace/unicode corpora") {
    import spark.implicits._
    // deterministic nasty-fragment pool: the equivalence risk is MY
    // replication of Spark's trim (0x20 only) + split("\\s+", -1)
    // semantics inside MinHashBandSigs.compute — exercise every edge:
    // non-space leading/trailing whitespace (kept by trim, makes empty
    // tokens), unicode spaces, CJK, combining marks, empty strings
    val frags = Array("word", "Wort", "été", "中文", "a", "",
      " ", "\t", "\n", "\r", "", " ", " ", "　",
      "x́", "end.", "  ", "\t\n", "tok-en", "123")
    val docs = (0 until 300).map { caseI =>
      // Long-mod BEFORE toInt: truncating first goes negative ~50% of the
      // time and a negative length silently empties the doc
      val len = ((graft.sources.PageGen.rnd(23L, 0, caseI) >>> 1) % 24).toInt
      val s = (0 until len).map(i =>
        frags(((graft.sources.PageGen.rnd(23L, 1, caseI, i) >>> 1) % frags.length).toInt))
        .mkString("")
      (caseI.toLong, s)
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"band".cast("long"), $"sig")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val agg = rows(graft.operators.Dedup.minhashBands(docs, "doc_id", "text", n = 2, bands = 4))
    val rww = rows(graft.operators.Dedup.minhashBandsRowwise(docs, "doc_id", "text", n = 2, bands = 4))
    assert(agg == rww,
      s"only-agg=${(agg -- rww).take(3)} only-rowwise=${(rww -- agg).take(3)}")
  }

  test("streaming near-dup band dedup: greedy suppression across batches, no mutual theft") {
    import spark.implicits._
    val cp = Files.createTempDirectory("ndcp").toString
    val table = Files.createTempDirectory("ndtbl").toString
    val sink = new ExactlyOnceSink(table)
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)
    val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val editText = baseText.replace("tok20", "EDITED") // near-dup: 1-token edit
    val otherText = (1 to 40).map(i => s"other$i").mkString(" ")

    def start() = {
      val verdicts = StreamDedup.nearDupVerdicts(in.toDF(), "doc_id", "text",
        "event_ts", "10 minutes", horizonUs = 3600L * 1000000L, n = 3, bands = 8)
      verdicts.toDF().writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink.write(StreamDedup.keptInBatch(df.toDF()), id))
        .start()
    }

    var q = start()
    // batch 1: doc 1 and its SAME-BATCH near-dup doc 2 — deterministic greedy:
    // doc 1 (earlier ts) claims every contested bucket, doc 2 is suppressed;
    // they must never steal from each other symmetrically (both-dropped)
    in.addData(DocRow(1, ts(base), baseText), DocRow(2, ts(base + 5), editText))
    q.processAllAvailable()
    // batch 2: a later re-crawl of doc 1's content + a novel doc
    in.addData(DocRow(3, ts(base + 60), baseText), DocRow(4, ts(base + 70), otherText))
    q.processAllAvailable()
    q.stop() // kill

    q = start() // resume: bucket claims survive the restart
    in.addData(DocRow(5, ts(base + 120), editText), DocRow(6, ts(base + 130), "tiny"))
    q.processAllAvailable()
    q.stop()

    val kept = sink.read(spark).select($"id").as[String].collect().map(_.toLong).sorted.toSeq
    // 1 claims; 2/3/5 are near-dups of 1; 4 novel; 6 has <3 tokens → no
    // band rows → no verdict rows at all (documented contract)
    assert(kept == Seq(1L, 4L), s"kept $kept")
  }

  test("streaming near-dup verdicts equal the batch mirror rule (q44 semantics)") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text").where($"doc_id" < 120)
    // batch mirror: stolen iff an earlier (smaller-id) doc shares a bucket
    val mh = graft.operators.Dedup.minhashBandsRowwise(docs, "doc_id", "text", 3, 8)
    val stolen = mh.join(
        mh.select($"doc_id".as("prior_id"), $"band", $"sig"), Seq("band", "sig"))
      .where($"prior_id" < $"doc_id").select($"doc_id").distinct()
    val batchKept = docs.join(stolen, Seq("doc_id"), "left_anti")
      .join(mh.select($"doc_id").distinct(), Seq("doc_id")) // only docs WITH bands
      .select($"doc_id").as[Long].collect().sorted.toSeq

    // streaming: one doc per second in doc_id order → earlier id == earlier ts
    val cp = Files.createTempDirectory("nd2cp").toString
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)
    val rows = docs.orderBy($"doc_id").as[(Long, String)].collect()
      .map { case (id, text) => DocRow(id, ts(base + id), text) }
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamDedup.nearDupVerdicts(in.toDF(), "doc_id", "text",
      "event_ts", "10 minutes", horizonUs = 86400L * 1000000L, n = 3, bands = 8)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= StreamDedup.keptInBatch(df.toDF())
          .select($"id").collect().map(_.getString(0).toLong)
        ()
      }
      .start()
    rows.grouped(40).foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
    q.stop()
    assert(got.sorted.toSeq == batchKept,
      s"stream-only=${(got.toSet -- batchKept).take(5)} batch-only=${(batchKept.toSet -- got).take(5)}")
  }

  test("prepPipeline: full streaming prep equals the batch mirror over real docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.TextAnalysis
    val minQ = 40
    val langs = Seq("en", "de", "fr", "es", "zh")
    val docs0 = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text").where($"doc_id" < 120)
    // append a re-crawl of a gated doc (layout change only — same
    // fingerprint) so the exact-dedup link of the chain is exercised by a
    // REAL duplicate, not just pass-through rows
    val recrawlSrc = docs0
      .where(TextAnalysis.qualityScore($"text") >= minQ &&
        TextAnalysis.langId($"text").isin(langs: _*))
      .orderBy($"doc_id").select($"text").as[String].head()
    // punctuation-only delta: fingerprint (lowercase + strip non-alnum)
    // is identical, while the case-sensitive quality/lang gates still pass
    val docs = docs0.unionByName(
      Seq((1000L, recrawlSrc + ".")).toDF("doc_id", "text"))

    // batch mirror, stage by stage: gates -> min-id keeper per fingerprint
    // -> greedy earlier-id band rule over the exact survivors only
    val gated = docs.where(TextAnalysis.qualityScore($"text") >= minQ &&
      TextAnalysis.langId($"text").isin(langs: _*))
    val keepers = gated
      .withColumn("fp", TextAnalysis.fingerprint($"text"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp").orderBy($"doc_id")))
      .where($"rk" === 1).select($"doc_id", $"text")
    val mh = graft.operators.Dedup.minhashBandsRowwise(keepers, "doc_id", "text", 3, 8)
    val stolen = mh.join(
        mh.select($"doc_id".as("prior_id"), $"band", $"sig"), Seq("band", "sig"))
      .where($"prior_id" < $"doc_id").select($"doc_id").distinct()
    val batchKept = keepers.join(stolen, Seq("doc_id"), "left_anti")
      .join(mh.select($"doc_id").distinct(), Seq("doc_id"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(gated.count() < docs.count(), "gates must reject something")
    assert(gated.where($"doc_id" === 1000L).count() == 1,
      "the re-crawl must pass the gates so the dedup stage sees it")
    assert(!batchKept.contains(1000L), "the re-crawl must lose to its original")
    assert(batchKept.nonEmpty)

    // streaming: one doc per second in doc_id order => earlier id == earlier ts
    val cp = Files.createTempDirectory("prepcp").toString
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)
    val rows = docs.orderBy($"doc_id").as[(Long, String)].collect()
      .map { case (id, text) => DocRow(id, ts(base + id), text) }
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamDedup.prepPipeline(in.toDF(), "doc_id", "text", "event_ts",
      "10 minutes", horizonUs = 86400L * 1000000L, minQuality = minQ, langs = langs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= StreamDedup.keptInBatch(df.toDF())
          .select($"id").collect().map(_.getString(0).toLong)
        ()
      }
      .start()
    rows.grouped(40).foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
    q.stop()
    assert(got.sorted.toSeq == batchKept,
      s"stream-only=${(got.toSet -- batchKept).take(5)} batch-only=${(batchKept.toSet -- got).take(5)}")
  }

  test("keptInBatch: same-id copies in one batch keep the id when its first copy claimed") {
    import spark.implicits._
    // id A, copy 1 claimed both bands (stolen=false), copy 2 found them
    // claimed (stolen=true); id B is a genuine near-dup (all stolen)
    val verdicts = Seq(
      ("A", ts(base), 0, false), ("A", ts(base), 1, false),
      ("A", ts(base + 1), 0, true), ("A", ts(base + 1), 1, true),
      ("B", ts(base + 2), 0, true), ("B", ts(base + 2), 1, true))
      .toDF("id", "ts", "band", "stolen")
    val kept = StreamDedup.keptInBatch(verdicts).select($"id").as[String].collect().toSeq
    assert(kept == Seq("A"), s"kept $kept — a re-crawled id must not erase its own keeper")
  }

  test("same-timestamp bucket ties resolve numerically for decimal ids (batch-mirror order)") {
    import spark.implicits._
    val cp = Files.createTempDirectory("tiecp").toString
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val q = StreamDedup.nearDupVerdicts(in.toDF(), "doc_id", "text",
      "event_ts", "10 minutes", horizonUs = 3600L * 1000000L)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= StreamDedup.keptInBatch(df.toDF()).select($"id").as[String].collect()
        ()
      }
      .start()
    // ids 10 and 2, IDENTICAL text and ts: lexicographic strings would pick
    // "10"; the (length, lex) order must pick 2 like the q44 mirror rule
    in.addData(DocRow(10, ts(base), text), DocRow(2, ts(base), text))
    q.processAllAvailable()
    q.stop()
    assert(got.toSeq == Seq("2"), s"kept $got — ties must break toward the smaller id")
  }

  test("exact dedup chains into near-dup dedup in ONE streaming query") {
    import spark.implicits._
    // Spark 4 multiple-stateful-operator support: dropDuplicatesWithin-
    // Watermark -> flatMapGroupsWithState in a single query (the full
    // ingest-dedup pipeline with one checkpoint); the second stage must
    // NOT redefine the watermark (applyWatermark = false)
    val cp = Files.createTempDirectory("chaincp").toString
    val in = MemoryStream[DocRow](Encoders.product[DocRow], spark)
    val exact = StreamDedup.byFingerprint(in.toDF(), "text", "event_ts", "10 minutes")
    val verdicts = StreamDedup.nearDupVerdicts(exact, "doc_id", "text",
      "event_ts", "10 minutes", horizonUs = 3600L * 1000000L,
      applyWatermark = false)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = verdicts.toDF().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= StreamDedup.keptInBatch(df.toDF()).select($"id").as[String].collect().map(_.toLong)
        ()
      }
      .start()
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    in.addData(DocRow(1, ts(base), text),
      DocRow(2, ts(base + 5), text.toUpperCase)) // exact dup modulo case: stage-1 drop
    q.processAllAvailable()
    in.addData(DocRow(3, ts(base + 60), text.replace("w9", "EDIT")), // near-dup: stage-2 drop
      DocRow(4, ts(base + 70), (1 to 30).map(i => s"z$i").mkString(" "))) // novel
    q.processAllAvailable()
    q.stop()
    assert(got.sorted.toSeq == Seq(1L, 4L), s"kept $got")
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
