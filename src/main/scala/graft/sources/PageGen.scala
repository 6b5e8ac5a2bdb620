package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{HostMeta, RawPage}

/**
 * Deterministic synthetic Common-Crawl-style page generator.
 *
 * Replaces the reference's fetcher plane (`fetcher/FileFrameFetcher.java`,
 * `fetcher/StreamFrameFetcher.java` — SURVEY.md §2.1) as the test/bench
 * source. Every row is a pure function of `(seed, id)`:
 *   - byte-stable across runs, partition counts, and parallelism levels
 *     (the scaling-efficiency protocol in BASELINE.md depends on this);
 *   - the expected extracted text is generated in lockstep with the HTML,
 *     so the byte-identical-per-url invariant is directly testable;
 *   - host frequencies are Zipf-distributed — reproducing the hot-host
 *     skew of StormCV's `fieldsGrouping` hash routing (the `grouping`
 *     package), the skew surface the north rule requires us to handle;
 *   - per-host session structure (intra-session vs inter-session gaps) is
 *     closed-form, so expected session windows are known exactly.
 *
 * Host → id mapping: host h owns the contiguous id range
 * [boundary(h), boundary(h+1)) where boundaries follow the Zipf CDF.
 * Page k of host h sits in session j = k / pagesPerSession(h); timestamps
 * are O(1) closed-form (no prefix scans — generation is embarrassingly
 * parallel, which is what lets the same code generate 10^12 rows on a
 * real cluster).
 */
final case class PageGenConfig(
    seed: Long = 42L,
    nPages: Long = 100000L,
    nHosts: Int = 100,
    zipfS: Double = 1.2,
    sessionGapSec: Int = 1800,
    intraGapSec: Int = 60,
    langFracNonEn: Double = 0.3,
    scriptFrac: Double = 0.15,
    entityFrac: Double = 0.2,
    malformedFrac: Double = 0.05,
    paraMult: Int = 1,
    parallelism: Int = 32,
    baseEpochSec: Long = 1700000000L) {
  /** inter-session gap; ≥ 3× sessionGap so jitter can never close a gap. */
  def interGapSec: Int = sessionGapSec * 3
}

/** Generator row: RawPage fields + the oracle text/lang for invariant tests. */
final case class GenPage(
    url: String,
    host: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    expected_text: String,
    lang: String)

object PageGen {

  // ---- splittable RNG ------------------------------------------------------
  /** splitmix64 finalizer — the standard public mixing constants. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic draw from (seed, stream-tag, coordinates). */
  def rnd(seed: Long, tag: Long, a: Long, b: Long = 0L): Long =
    mix64(mix64(mix64(seed ^ (tag * 0xA24BAED4963EE407L)) ^ a) ^ b)

  /** non-negative modulo draw */
  def draw(seed: Long, tag: Long, a: Long, b: Long, n: Int): Int =
    (((rnd(seed, tag, a, b) >>> 1) % n).toInt)

  def unit(seed: Long, tag: Long, a: Long, b: Long = 0L): Double =
    (rnd(seed, tag, a, b) >>> 11).toDouble / (1L << 53).toDouble

  // ---- Zipf host layout ----------------------------------------------------
  /** boundaries(h) = first page id owned by host h; length nHosts+1. */
  def hostBoundaries(cfg: PageGenConfig): Array[Long] = {
    val w = Array.tabulate(cfg.nHosts)(k => math.pow(k + 1.0, -cfg.zipfS))
    val total = w.sum
    val bounds = new Array[Long](cfg.nHosts + 1)
    var cum = 0.0
    var h = 0
    while (h < cfg.nHosts) {
      cum += w(h) / total
      bounds(h + 1) = math.min(cfg.nPages, math.round(cum * cfg.nPages))
      h += 1
    }
    bounds(cfg.nHosts) = cfg.nPages
    // guarantee monotonicity (tiny hosts may round to empty ranges — fine)
    h = 1
    while (h <= cfg.nHosts) {
      if (bounds(h) < bounds(h - 1)) bounds(h) = bounds(h - 1)
      h += 1
    }
    bounds
  }

  def hostName(h: Int): String = f"host-$h%05d.example"

  /** host id owning page `id` (binary search over boundaries). */
  def hostOfId(bounds: Array[Long], id: Long): Int = {
    var lo = 0
    var hi = bounds.length - 1 // invariant: bounds(lo) <= id < bounds(hi)
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= id) lo = mid else hi = mid
    }
    lo
  }

  // ---- session-timestamp closed form --------------------------------------
  def pagesPerSession(cfg: PageGenConfig, h: Int): Int =
    1 + draw(cfg.seed, 1, h, 0, 9) // 1..9

  /** epoch seconds of page k of host h — O(1), session-structured. */
  def tsSec(cfg: PageGenConfig, h: Int, k: Long): Long = {
    val l = pagesPerSession(cfg, h)
    val j = k / l
    val pos = k % l
    val sessionSpan = l.toLong * cfg.intraGapSec + cfg.interGapSec
    val hostPhase = draw(cfg.seed, 2, h, 0, cfg.interGapSec)
    val jInter = draw(cfg.seed, 3, h, j, cfg.interGapSec / 4)
    val jIntra = draw(cfg.seed, 4, h, k, cfg.intraGapSec / 2)
    cfg.baseEpochSec + hostPhase + j * sessionSpan + pos * cfg.intraGapSec + jIntra + jInter
  }

  // ---- vocabulary ----------------------------------------------------------
  val langs: Array[String] = Array("en", "de", "fr", "es")
  val vocab: Map[String, Array[String]] = Map(
    "en" -> ("the of and to in is was for on that with as his they at be this from have or had by word but not what all were when your can said there use each which she how their will other about out many then them".split(' ')),
    "de" -> ("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über".split(' ')),
    "fr" -> ("le de un être et à il avoir ne je son que se qui ce dans en du elle au pour pas vous par sur faire plus dire me on mon lui nous comme mais avec tout".split(' ')),
    "es" -> ("el la de que y a en un ser se no haber por con su para como estar tener le lo todo pero más hacer o poder decir este ir otro ese si me ya ver".split(' ')))

  def langOf(cfg: PageGenConfig, h: Int): String =
    if (unit(cfg.seed, 5, h) >= cfg.langFracNonEn) "en"
    else langs(1 + draw(cfg.seed, 6, h, 0, langs.length - 1))

  // ---- page synthesis ------------------------------------------------------
  /**
   * Builds html and expected extracted text in lockstep. The html exercises
   * nested tags, attributes, entities, script/style blocks, comments, and
   * (optionally) a trailing malformed fragment — all cases of
   * [[graft.functions.HtmlText]]'s spec.
   */
  def genPage(cfg: PageGenConfig, bounds: Array[Long], id: Long): GenPage = {
    val h = hostOfId(bounds, id)
    val host = hostName(h)
    val lang = langOf(cfg, h)
    val words = vocab(lang)
    val k = id - bounds(h)
    val url = s"https://$host/p/$k"

    val html = new StringBuilder(1024)
    val text = new StringBuilder(512)
    var emitted = false
    def word(tagSalt: Long, i: Long): String = words(draw(cfg.seed, 7 + tagSalt, id, i, words.length))
    def emitWord(w: String): Unit = {
      if (emitted) text.append(' ')
      text.append(w)
      emitted = true
    }

    val nTitle = 3 + draw(cfg.seed, 8, id, 0, 4)
    val nParas = (1 + draw(cfg.seed, 9, id, 0, 4)) * cfg.paraMult

    html.append("<!DOCTYPE html>\n<html lang=\"").append(lang)
      .append("\">\n<head>\n<title>")
    var i = 0
    while (i < nTitle) {
      val w = word(0, i)
      if (i > 0) html.append(' ')
      html.append(w); emitWord(w)
      i += 1
    }
    html.append("</title>\n")
    if (unit(cfg.seed, 10, id) < cfg.scriptFrac)
      html.append("<script type=\"text/javascript\">var s_").append(id % 97)
        .append(" = 'not text &amp; never extracted';</script>\n")
    html.append("<style>body { margin: ").append(id % 7).append("px; }</style>\n")
    html.append("</head>\n<body>\n<!-- crawl id ").append(id).append(" -->\n")
    html.append("<h1>").append(host).append("</h1>\n")
    emitWord(host)

    var p = 0
    while (p < nParas) {
      html.append("<p class=\"para\" data-idx=\"").append(p).append("\">")
      val nWords = 8 + draw(cfg.seed, 11, id, p, 23)
      var wI = 0
      while (wI < nWords) {
        val w = word(20 + p, wI)
        if (wI > 0) html.append(' ')
        if (cfg.entityFrac > 0 && draw(cfg.seed, 12, id, p * 1000L + wI, 1000) < (cfg.entityFrac * 1000).toInt) {
          // entity-encoded token; expected text holds the decoded form
          html.append("&quot;").append(w).append("&quot; &amp; &#8212;")
          emitWord("\"" + w + "\""); emitWord("&"); emitWord("—")
        } else if (wI % 11 == 5) {
          html.append("<b>").append(w).append("</b>")
          emitWord(w)
        } else {
          html.append(w); emitWord(w)
        }
        wI += 1
      }
      html.append("</p>\n")
      p += 1
    }
    html.append("<div class=\"footer\"><a href=\"/p/").append(k + 1)
      .append("\">next&nbsp;page</a></div>\n")
    emitWord("next"); emitWord("page")
    // one absolute cross-host outlink per page — the host-graph signal a
    // crawl corpus carries (target deterministic from id; may land on the
    // own host, which is the edge-builder's self-link drop case). The
    // anchor word comes from the page's own language vocabulary so the
    // langId distribution is untouched.
    val dstH = draw(cfg.seed, 17, id, 0, cfg.nHosts)
    val aw = word(11, 0)
    html.append("<a href=\"https://").append(hostName(dstH))
      .append("/p/0\">").append(aw).append("</a>\n")
    emitWord(aw)
    html.append("</body></html>")
    if (unit(cfg.seed, 13, id) < cfg.malformedFrac)
      html.append("\n<div class=unterminated") // unclosed tag at EOF: dropped

    GenPage(url, host, new Timestamp(tsSec(cfg, h, id - bounds(h)) * 1000L),
      html.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text.toString, lang)
  }

  // ---- Spark datasets ------------------------------------------------------
  /** Full generator output incl. the expected-text oracle column. */
  def genPages(spark: SparkSession, cfg: PageGenConfig): Dataset[GenPage] = {
    import spark.implicits._
    val bounds = hostBoundaries(cfg)
    spark.range(0L, cfg.nPages, 1L, cfg.parallelism)
      .map(id => genPage(cfg, bounds, id))
  }

  /** Engine-facing ingest rows (no oracle columns). */
  def rawPages(spark: SparkSession, cfg: PageGenConfig): Dataset[RawPage] = {
    import spark.implicits._
    genPages(spark, cfg).map(g => RawPage(g.url, g.host, g.warc_ts, g.html))
  }

  /**
   * Per-host metadata stream (join partner; FIXTURES.md §2). One record per
   * host per session-span period so stream-stream joins have matches.
   */
  def hostMeta(spark: SparkSession, cfg: PageGenConfig): Dataset[HostMeta] = {
    import spark.implicits._
    val bounds = hostBoundaries(cfg)
    val categories = Array("news", "shop", "blog", "docs", "social")
    val rows = cfg.nHosts.toLong
    spark.range(0L, rows, 1L, math.min(cfg.parallelism, cfg.nHosts)).flatMap { hL =>
      val h = hL.toInt
      val count = bounds(h + 1) - bounds(h)
      if (count <= 0) Iterator.empty
      else {
        val l = pagesPerSession(cfg, h)
        val nSessions = (count + l - 1) / l
        val sessionSpan = l.toLong * cfg.intraGapSec + cfg.interGapSec
        val hostPhase = draw(cfg.seed, 2, h, 0, cfg.interGapSec)
        (0L until nSessions).iterator.map { j =>
          val ts = cfg.baseEpochSec + hostPhase + j * sessionSpan + draw(cfg.seed, 14, h, j, cfg.intraGapSec)
          HostMeta(hostName(h), new Timestamp(ts * 1000L),
            draw(cfg.seed, 15, h, j, 10000) / 100.0,
            categories(draw(cfg.seed, 16, h, j, categories.length)))
        }
      }
    }
  }
}
