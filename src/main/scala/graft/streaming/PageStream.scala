package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{HostMeta, RawPage}
import graft.sources.{PageGen, PageGenConfig}

/**
 * Streaming page sources — the engine's fetcher plane (SURVEY.md §2.1).
 *
 * [[fromRate]] drives the deterministic generator from Spark's `rate`
 * source: row `value` = page id ⇒ the stream's *content* is a pure
 * function of (seed, id) while its *arrival schedule* is controlled by
 * `rowsPerSecond` — the analog of `StreamFrameFetcher`'s live RTSP
 * streams (`fetcher/StreamFrameFetcher.java:41-159`) with
 * `maxOffsetsPerTrigger`-style admission instead of bounded-queue sleeps
 * (`util/StreamReader.java:171-173`).
 *
 * Out-of-order arrival: ids are bit-mixed within blocks of `shuffleBlock`
 * so event times arrive scrambled (late/early within a bounded horizon) —
 * exercising watermark semantics the way the reference's unordered
 * multi-stream interleave did.
 */
object PageStream {

  def fromRate(spark: SparkSession, cfg: PageGenConfig, rowsPerSecond: Long,
      numPartitions: Int = 8, shuffleBlock: Int = 1024): Dataset[RawPage] = {
    import spark.implicits._
    val bounds = PageGen.hostBoundaries(cfg)
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", numPartitions)
      .load()
      .select(col("value"))
      .as[Long]
      .map { v =>
        // scramble arrival order inside fixed blocks (deterministic)
        val block = v / shuffleBlock
        val base = block * shuffleBlock
        val idx = v - base
        val mixed = base + ((idx * 757L + (PageGen.mix64(block) >>> 55)) % shuffleBlock)
        // wrap, don't clamp: past one pass the stream must CYCLE page ids
        // (re-crawl semantics the link-graph / gate app modes rely on) —
        // a min() here would collapse every post-cycle row onto the last
        // page id, a synthetic hot key no real crawl produces
        val id = mixed % cfg.nPages
        val g = PageGen.genPage(cfg, bounds, id)
        RawPage(g.url, g.host, g.warc_ts, g.html)
      }
  }

  /** Streaming per-host metadata (join partner), also rate-driven. */
  def metaFromRate(spark: SparkSession, cfg: PageGenConfig, rowsPerSecond: Long)
      : Dataset[HostMeta] = {
    import spark.implicits._
    val bounds = PageGen.hostBoundaries(cfg)
    val categories = Array("news", "shop", "blog", "docs", "social")
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("value"))
      .as[Long]
      .map { v =>
        val h = (v % cfg.nHosts).toInt
        val j = v / cfg.nHosts
        val l = PageGen.pagesPerSession(cfg, h)
        val span = l.toLong * cfg.intraGapSec + cfg.interGapSec
        val phase = PageGen.draw(cfg.seed, 2, h, 0, cfg.interGapSec)
        val ts = cfg.baseEpochSec + phase + j * span +
          PageGen.draw(cfg.seed, 14, h, j, cfg.intraGapSec)
        HostMeta(PageGen.hostName(h), new java.sql.Timestamp(ts * 1000L),
          PageGen.draw(cfg.seed, 15, h, j, 10000) / 100.0,
          categories(PageGen.draw(cfg.seed, 16, h, j, categories.length)))
      }
  }

  /**
   * Watermarked stream-stream equi-join of pages against per-host
   * metadata — the north rule's stateful join (reference analog:
   * `SequenceNrBatcher`+`FeatureCombinerOp` fan-in,
   * `E3_MultipleFeaturesTopology.java:75-77`). The symmetric time-band
   * condition lets Spark evict both sides' state at the watermark.
   */
  def joinPagesWithMeta(pages: DataFrame, meta: DataFrame,
      bandUs: Long = 1800L * 1000000L,
      pageWatermark: String = "1 hour", metaWatermark: String = "1 hour"): DataFrame = {
    val p = pages.withWatermark("warc_ts", pageWatermark)
    val m = meta.withWatermark("meta_ts", metaWatermark)
    p.join(m,
      p("host") === m("host") &&
        m("meta_ts") >= p("warc_ts") - expr(s"INTERVAL ${bandUs / 1000000L} SECONDS") &&
        m("meta_ts") <= p("warc_ts") + expr(s"INTERVAL ${bandUs / 1000000L} SECONDS"))
      .drop(m("host"))
  }
}
