package graft

import org.apache.spark.sql.functions._

import graft.examples.ReferenceExamples
import graft.functions.ExtractHtmlText.extract_html_text
import graft.operators.Windows
import graft.sources.{PageGen, PageGenConfig}

/**
 * The nine reference example topologies (E1–E9), assembled through the
 * fluent facade, run end-to-end on the deterministic page corpus — the
 * program-level "switch and run" check on top of per-operator coverage.
 */
class ReferenceExamplesSpec extends SparkSpec {

  private lazy val cfg = PageGenConfig(nPages = 1500, nHosts = 40)
  private lazy val pages = PageGen.rawPages(spark, cfg).toDF()
  private lazy val texts = pages
    .withColumn("text", extract_html_text(col("html"))).drop("html")

  test("E1 grayscale: normalized form + sliding viewer windows") {
    val out = ReferenceExamples.e1Grayscale(pages)
    assert(out.columns.toSet == Set("host", "n", "w_start", "w_end"))
    // each page lands in exactly two 1h/30m windows
    assert(out.agg(sum(col("n"))).head.getLong(0) == 2L * cfg.nPages)
  }

  test("E2 face detection: planted templates match their own pages first") {
    val templates = texts.orderBy(col("url")).limit(2)
      .select(col("url").as("template_url"), col("text").as("template_text"))
    val out = ReferenceExamples.e2FaceDetection(spark, pages, templates)
    val self = out.where(col("request_id") === col("doc_id"))
      .select(col("request_id"), col("score_q"), col("rk"))
      .collect()
    assert(self.length == 2 &&
      self.forall(r => r.getLong(1) == 1000L && r.getLong(2) == 1L), self.mkString(";"))
  }

  test("E3 multiple features: both branches reunited per url") {
    val out = ReferenceExamples.e3MultipleFeatures(pages)
    assert(out.columns.toSet == Set("url", "quality_q", "lang_pred"))
    assert(out.count() == cfg.nPages &&
      out.where(col("quality_q").isNull || col("lang_pred").isNull).isEmpty)
  }

  test("E4 sequential features: one pair per successor, deltas consistent") {
    val out = ReferenceExamples.e4SequentialFeatures(pages)
    val hosts = texts.select(col("host")).distinct().count()
    assert(out.count() == cfg.nPages - hosts)
    assert(out.where(col("flow") =!= col("len") - col("prev_len")).isEmpty)
  }

  test("E5 tiling: recombined tiles reproduce every page's text") {
    val out = ReferenceExamples.e5Tiling(pages, nTiles = 4)
    val bad = out.join(texts.select(col("url"), col("text")), Seq("url"))
      .where(col("recombined_text") =!= col("text") || col("n_sections") =!= 4)
    assert(out.count() == cfg.nPages && bad.isEmpty)
  }

  test("E6 group of frames: fixed-size groups per host cover the corpus") {
    val out = ReferenceExamples.e6GroupOfFrames(pages, n = 4)
    assert(out.agg(sum(col("n_rows"))).head.getLong(0) == cfg.nPages)
    assert(out.where(col("n_rows") > 4).isEmpty)
    // only the LAST batch of a host may be ragged
    val ragged = out.groupBy(col("host"))
      .agg(count(when(col("n_rows") < 4, 1)).as("partial"))
    assert(ragged.where(col("partial") > 1).isEmpty)
    // group-wise flow equals an independent explode + lag recomputation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"), col("batch_id"))
      .orderBy(col("g.ts"), col("g.url"))
    val ref = out.select(col("host"), col("batch_id"), explode(col("group")).as("g"))
      .withColumn("prev", lag(col("g.len"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("host"), col("batch_id"))
      .agg(sum(abs(col("g.len") - col("prev"))).as("ref_flow"))
    val bad = out.join(ref, Seq("host", "batch_id"), "left")
      .where(col("flow_sum") =!= coalesce(col("ref_flow"), lit(0L)))
    assert(bad.isEmpty)
    assert(out.where(col("n_rows") === 1 && col("flow_sum") =!= 0).isEmpty)
  }

  test("E7 fetch+operate: one fused stage, zero exchanges, values right") {
    val out = ReferenceExamples.e7FetchOperate(pages)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val direct = texts
      .withColumn("quality_q", graft.operators.TextAnalysis.qualityScore(col("text")))
      .withColumn("tokens", graft.operators.TextAnalysis.tokenCount(col("text")))
    assert(out.select(col("url"), col("quality_q"), col("tokens"))
      .exceptAll(direct.select(col("url"), col("quality_q"), col("tokens"))).isEmpty)
  }

  test("E8 background subtraction: chain equals the session-window plane") {
    val out = ReferenceExamples.e8BackgroundSubtraction(pages)
    val direct = Windows.session(texts, "warc_ts", "30 minutes", Seq(col("host")),
      Seq(count(lit(1)).as("n_pages"), sum(length(col("text"))).as("chars")))
    assert(out.count() > 0 && out.exceptAll(direct).isEmpty
      && direct.exceptAll(out).isEmpty)
  }

  test("E1 chain streams with a watermark stage; windows equal the batch mirror") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.RawPage
    val bounds = PageGen.hostBoundaries(cfg)
    val rows = (0L until 80L).map { id =>
      val g = PageGen.genPage(cfg, bounds, id)
      RawPage(g.url, g.host, g.warc_ts, g.html)
    }
    val lastUs = rows.map(_.warc_ts.getTime).max
    def flush(offsetH: Int) = RawPage("http://zz.flush/x", "zz.flush",
      new java.sql.Timestamp(lastUs + offsetH * 3600L * 1000L), Array[Byte]())
    val input = MemoryStream[RawPage](Encoders.product[RawPage], spark)
    val q = ReferenceExamples.e1Grayscale(input.toDF(), Some("10 minutes"))
      .writeStream.format("memory").queryName("e1_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(40)); q.processAllAvailable()
      input.addData(rows.drop(40)); q.processAllAvailable()
      input.addData(flush(3)); q.processAllAvailable()
      input.addData(flush(6)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("e1_stream").where(col("host") =!= "zz.flush")
      .collect().map(_.toSeq).toSet
    import spark.implicits._
    val want = ReferenceExamples.e1Grayscale(rows.toDF())
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("E7 chain runs unchanged on a stream (mode-agnostic facade)") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.RawPage
    val bounds = PageGen.hostBoundaries(cfg)
    val rows = (0L until 60L).map { id =>
      val g = PageGen.genPage(cfg, bounds, id)
      RawPage(g.url, g.host, g.warc_ts, g.html)
    }
    val input = MemoryStream[RawPage](Encoders.product[RawPage], spark)
    val q = ReferenceExamples.e7FetchOperate(input.toDF())
      .writeStream.format("memory").queryName("e7_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(30)); q.processAllAvailable()
      input.addData(rows.drop(30)); q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val got = spark.table("e7_stream")
      .select(col("url"), col("quality_q"), col("tokens"))
      .collect().map(_.toSeq).toSet
    val want = ReferenceExamples.e7FetchOperate(rows.toDF())
      .select(col("url"), col("quality_q"), col("tokens"))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == 60)
  }

  test("E9 contrast enhancement: per-page scalar in the per-mille range") {
    val out = ReferenceExamples.e9ContrastEnhancement(pages)
    assert(out.count() == cfg.nPages)
    assert(out.where(col("enhanced_q") < 0 || col("enhanced_q") > 1000).isEmpty)
  }
}
