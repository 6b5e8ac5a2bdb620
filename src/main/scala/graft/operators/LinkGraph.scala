package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/**
 * Host-level link graph over crawled pages — outlink extraction, the
 * host edge list, and a deterministic link-centrality score. This is
 * the link-based quality signal of a web-corpus pipeline (Common
 * Crawl publishes exactly this artifact — its host-level webgraph and
 * harmonic-centrality/PageRank ranks — and curation pipelines use the
 * rank as a quality prior alongside content gates).
 *
 * Reference analog: StormCV's `FeatureExtractionOp` emits per-frame
 * features that downstream bolts aggregate across frames
 * (`FeatureMatcherTopology`); here the per-page "feature" is the
 * outlink set and the cross-page aggregate is the host graph.
 *
 * Scale notes (the part that matters at 10^12 pages):
 *  - extraction is row-local codegen'd builtins (`regexp_extract_all`
 *    over the page bytes) pipelined inside the scan stage — the corpus
 *    is never shuffled on raw HTML;
 *  - the edge list is ONE hash-shuffle on (src_host, dst_host) — the
 *    output is hosts², bounded far below pages;
 *  - PageRank iterations join the EDGE table (host-sized, not
 *    page-sized) against the label table, one equi-join + one
 *    aggregation per round — the [[Components.connectedComponents]]
 *    loop shape, with per-round artifacts pinned via `localCheckpoint`.
 */
object LinkGraph {

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Absolute http(s) `<a href="...">` targets of one HTML page, in
    * document order. Deliberately a template-grade extractor on the
    * same contract as [[graft.functions.ExtractHtmlText]]: double- or
    * single-quoted href attributes of `<a>` tags, absolute URLs only
    * (relative links need the base URL and resolution policy — callers
    * that want them resolve against their own url column first). The
    * pattern is RE2-portable (no lookaround, no backrefs) so a DuckDB
    * oracle counts the same links. `href` must follow a delimiter —
    * `(?:[^>]*\\s)?href=` — so an attribute merely ENDING in href
    * (`data-xhref="…"`) cannot fabricate a phantom edge; a whitespace-
    * embedded ` href=` inside a quoted attribute VALUE can still fool
    * it (template-grade, documented). */
  def outlinkUrls(html: Column): Column =
    regexp_extract_all(html.cast(StringType),
      lit("(?i)<a\\s(?:[^>]*\\s)?href=[\"'](https?://[^\"']+)[\"']"), lit(1))

  /** Registrable host of an absolute URL: authority lowercased, any
    * `:port` suffix and userinfo stripped — the aggregation key of a
    * host-level graph (finer keys belong to [[UrlOps.canonicalizeUrl]]).
    * NULL for strings without a `scheme://authority` prefix. */
  def hostOf(url: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      HostOfUrl(org.apache.spark.sql.graftshim.Bridge.expression(url)))

  /** The original 3-regex formulation of [[hostOf]], kept as the
    * semantic reference the spec pins the builtin rewrite against. */
  private[graft] def hostOfRef(url: Column): Column = {
    val auth = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val h = regexp_replace(noUser, ":[0-9]+$", "")
    when(h === "", lit(null).cast(StringType)).otherwise(h)
  }

  /**
   * Host-level edge list `(src_host, dst_host, n_links)` from pages:
   * every absolute outlink of every page, keyed by the linking page's
   * host, self-links dropped (intra-host navigation is noise for
   * centrality), multiplicity counted across the whole corpus. One
   * shuffle, on the bounded (src, dst) key space.
   */
  def hostEdges(pages: DataFrame, htmlCol: String, hostCol: String): DataFrame =
    pages
      .select(col(hostCol).as("src_host"),
        explode(outlinkUrls(col(htmlCol))).as("u"))
      .select($"src_host", hostOf($"u").as("dst_host"))
      .where($"dst_host".isNotNull && $"dst_host" =!= $"src_host")
      .groupBy($"src_host", $"dst_host")
      .agg(count(lit(1)).as("n_links"))

  private val anchorPat =
    "(?i)<a\\s(?:[^>]*\\s)?href=[\"'](https?://[^\"']+)[\"'][^>]*>([^<]*)</a>"

  /**
   * Anchor-text index `(dst_host, anchor, n_links)` — what the web says
   * a host is about: the anchor strings of every cross-host absolute
   * link, keyed by the TARGET host and counted across the corpus (the
   * classic link-based retrieval field — anchor terms describe the
   * target better than the target's own text — and a training-data
   * label source). Intra-host links are dropped (self-description is
   * the page's own job); anchors are whitespace-trimmed, and empty
   * anchors are kept as `''`. NOTE anchor link mass is a SUBSET of
   * [[hostEdges]]' mass, not equal to it: the anchor group is `[^<]*`,
   * so a link whose anchor contains nested markup (`<a href=…><img …>
   * </a>`, `<b>bold</b>` anchors) contributes an edge but NO anchor row
   * — reconciling the two tables shows a deficit equal to the nested-
   * markup links (template-grade extraction, same contract as
   * [[outlinkUrls]]).
   *
   * Extraction is two aligned `regexp_extract_all` passes over the page
   * bytes with the SAME pattern (group 1 = href, group 2 = anchor), so
   * the zipped arrays index the same `<a>` tags by construction — both
   * passes are codegen'd builtins pipelined in the scan stage (no
   * interpreted higher-order functions on the hot path); the shuffle is
   * one exchange on the bounded (dst_host, anchor) key space.
   */
  def anchorIndex(pages: DataFrame, htmlCol: String, hostCol: String): DataFrame =
    pages
      .select(col(hostCol).as("src_host"),
        regexp_extract_all(col(htmlCol).cast(StringType),
          lit(anchorPat), lit(1)).as("__us"),
        regexp_extract_all(col(htmlCol).cast(StringType),
          lit(anchorPat), lit(2)).as("__as"))
      .select($"src_host", explode(arrays_zip($"__us", $"__as")).as("p"))
      .select($"src_host", hostOf($"p.__us").as("dst_host"),
        trim($"p.__as").as("anchor"))
      .where($"dst_host".isNotNull && $"dst_host" =!= $"src_host")
      .groupBy($"dst_host", $"anchor")
      .agg(count(lit(1)).as("n_links"))

  /**
   * Incremental edge-table maintenance: fold a fresh page epoch into the
   * persisted `(src_host, dst_host, n_links)` table. Link counts are
   * additive across disjoint page sets, so the merge is a union +
   * re-aggregation on the bounded (src, dst) key space — the same
   * epoch-fold idiom as [[Dedup.lineDfIncrement]], and like it the
   * fresh epoch must be disjoint from pages already folded in
   * (exactly-once epochs — the sink manifest's re-delivered-epoch
   * detection gives streaming callers this for free); a re-delivered
   * page permanently inflates its edges' counts.
   */
  def edgesIncrement(history: DataFrame, freshPages: DataFrame,
      htmlCol: String, hostCol: String): DataFrame =
    history.unionByName(hostEdges(freshPages, htmlCol, hostCol))
      .groupBy($"src_host", $"dst_host")
      .agg(sum($"n_links").as("n_links"))

  /**
   * Deterministic integer-arithmetic PageRank over a host edge list —
   * `(host, rank_micro)` after `iters` rounds, damping 0.85, ranks in
   * micro-units (initial mass 1 000 000 per host). Every step is BIGINT
   * arithmetic with floor division:
   *
   *   contrib(u→v) = (rank(u) · n_links(u,v)) div outdeg(u)
   *   rank'(v)     = 150 000 + (850 000 · Σ contrib(·→v)) div 1 000 000
   *
   * so two engines (and two cluster sizes) produce bit-identical ranks —
   * the same integer-exactness discipline as [[TextSearch.bm25TopK]]'s
   * integer idf. Weighted by link multiplicity; dangling hosts (no
   * outlinks) leak their mass, the standard uncorrected formulation —
   * fine for a relative quality prior. Headroom: the damping multiply
   * bounds intermediate values by 8.5e5 · Σrank, exact in BIGINT to
   * ~10^7 hosts per connected sink; beyond that rescale the micro-unit
   * (or move to the float variant and give up oracle exactness).
   *
   * Per round: ONE equi-join of edges against the host-sized rank table
   * + one aggregation; rounds are pinned with `localCheckpoint` like
   * [[Components.connectedComponents]] (deterministic recompute on
   * executor loss).
   */
  def pagerankInt(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // pin the edge table FIRST: ew and nodes both derive from it, and
    // without the pin each would re-run the full upstream (corpus scan +
    // extraction + edge shuffle) once more. The checkpoint also gives
    // the planner REAL size stats (an ExistingRDD scan), so the
    // host-sized rank table broadcasts in the per-round join when it
    // fits instead of planning a sort-merge join from unknown stats.
    val e = edges.select($"src_host".as("src"), $"dst_host".as("dst"),
      $"n_links".cast(LongType).as("n")).localCheckpoint()
    val deg = e.groupBy($"src").agg(sum($"n").as("d"))
    val ew = e.join(deg, "src").localCheckpoint()
    val nodes = e.select($"src".as("host"))
      .union(e.select($"dst".as("host"))).distinct().localCheckpoint()
    var r = nodes.select($"host", lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      // dangling-host base mass rides the SAME aggregation as the
      // contributions (guide §2.4): a zero row per node unioned under
      // the contrib groupBy replaces the former per-round `nodes LEFT
      // JOIN contribs` — one exchange on host instead of an aggregation
      // exchange PLUS a join. sum(c0)+0 == coalesce(c, 0) exactly.
      r = ew.join(r.withColumnRenamed("host", "src"), "src")
        .select($"dst".as("host"), expr("(r * n) div d").as("c0"))
        .union(nodes.select($"host", lit(0L).as("c0")))
        .groupBy($"host").agg(sum($"c0").as("c"))
        .select($"host",
          (lit(150000L) + expr("(850000 * c) div 1000000")).as("r"))
        .localCheckpoint()
    }
    r.select($"host", $"r".as("rank_micro"))
  }
}
