package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * URL canonicalization — the normalization pre-pass of URL-level
 * deduplication. A crawl dedups by canonical URL before any content
 * hashing (re-crawls of `http://HOST:80/a?b=2&a=1#x` and
 * `http://host/a?a=1&b=2` are the same fetch), the URL-keyed analog of
 * the reference keying every frame by its `streamId`
 * (`model/CVParticle.java:41-49`).
 *
 * Semantics (the RFC 3986 normalizations that are safe without touching
 * path bytes):
 *   - scheme and host lowercased (case-insensitive by spec);
 *   - default port stripped (`:80` for http, `:443` for https);
 *   - empty path becomes `/`;
 *   - query parameters sorted bytewise (order-insensitive dedup key),
 *     empty params dropped, a now-empty query drops its `?`;
 *   - fragment dropped (never sent to the server).
 *
 * Composed entirely from codegen'd builtins (`regexp_extract` / `split` /
 * `array_sort` / `concat`) — row-local, no shuffle, pipelined inside the
 * scan stage — and engine-portable: the q62 oracle rebuilds every step in
 * DuckDB digit-for-digit (no lookaround, no backrefs; both engines sort
 * strings bytewise). Returns NULL for strings with no
 * `scheme://authority` prefix (not a fetchable absolute URL).
 */
object UrlOps {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val authorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe = "\\?([^#]*)"

  def canonicalizeUrl(url: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      CanonUrl(org.apache.spark.sql.graftshim.Bridge.expression(url)))

  /** The original regex-chain formulation of [[canonicalizeUrl]] — the
    * semantic reference the spec fuzz-pins the [[UrlScan]] rewrite
    * against. Not for hot paths: its self-referencing `when` tree is
    * re-expanded at every downstream reference (see [[UrlScan]]). */
  private[graft] def canonicalizeUrlRef(url: Column): Column = {
    // strip the fragment FIRST: a '?' inside a fragment must not be
    // mistaken for a query on fragment-only URLs like http://h/p#a?b
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val rawHost = lower(regexp_extract(u, authorityRe, 1))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val path0 = regexp_extract(u, pathRe, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qSorted = array_join(
      array_sort(filter(split(regexp_extract(u, queryRe, 1), "&"),
        x => x =!= "")), "&")
    val query = when(qSorted === "", lit("")).otherwise(concat(lit("?"), qSorted))
    when(scheme === "" || rawHost === "", lit(null).cast(StringType))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /**
   * SURT key (Sort-friendly URI Reordering Transform) — the web-archive
   * locality key: `http://www.sub.example.com:8080/p?b=2&a=1` →
   * `com,example,sub)/p?a=1&b=2`. Reversing the host's labels puts every
   * page of a registrable domain — and every subdomain of it — on one
   * CONTIGUOUS key range, which is what makes a petabyte URL index
   * servable: stored sorted by this key, "everything under example.com"
   * is a range scan with file-level min/max pruning and a
   * `StringStartsWith` pushed to the parquet reader, never a corpus scan
   * with a LIKE. (Same public transform the Common Crawl URL index and
   * the Internet Archive's CDX machinery key by; the reference's nearest
   * device is keying every particle by streamId,
   * `model/CVParticle.java:41-49` — this is that key made range-friendly.)
   *
   * Normalizations, all row-local codegen'd builtins, each reproduced
   * digit-for-digit by the q107 DuckDB oracle: fragment stripped; host
   * lowercased, ANY port stripped (a locality key, not an identity — the
   * port never changes which site a page belongs to), one leading `www.`
   * dropped; labels reversed and comma-joined; empty path becomes `/`;
   * query params sorted bytewise with empties dropped (the
   * [[canonicalizeUrl]] rule). Scheme is dropped entirely (http/https
   * serve the same site). NULL for non-absolute URLs.
   */
  def surtKey(url: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      SurtKey(org.apache.spark.sql.graftshim.Bridge.expression(url)))

  /** The original regex-chain formulation of [[surtKey]] — the semantic
    * reference the spec fuzz-pins the [[UrlScan]] rewrite against. */
  private[graft] def surtKeyRef(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val rawHost = lower(regexp_extract(u, authorityRe, 1))
    val host = regexp_replace(regexp_replace(rawHost, ":[0-9]+$", ""),
      "^www\\.", "")
    val revHost = array_join(reverse(split(host, "\\.")), ",")
    val path0 = regexp_extract(u, pathRe, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qSorted = array_join(
      array_sort(filter(split(regexp_extract(u, queryRe, 1), "&"),
        x => x =!= "")), "&")
    val query = when(qSorted === "", lit("")).otherwise(concat(lit("?"), qSorted))
    when(scheme === "" || rawHost === "", lit(null).cast(StringType))
      .otherwise(concat(revHost, lit(")"), path, query))
  }

  /**
   * Snapshot dedup of a re-crawl log: one row per CANONICAL url — the
   * newest capture wins. This is the serving-side read of any table that
   * accumulates repeated fetches of the same page (the app's gate /
   * link-graph modes append one row per arrival; a crawl archive holds
   * one record per fetch), the engine's analog of the reference polling
   * the same url forever and downstream caring only about the freshest
   * frame (`fetcher/RefreshingImageFetcher.java:26-28`).
   *
   * Keyed by [[canonicalizeUrl]], so raw spellings of the same fetch
   * (`HTTP://Host:80/p?b=2&a=1` vs `http://host/p?a=1&b=2`) collapse to
   * one snapshot row; rows whose url does not canonicalize (no
   * `scheme://authority`) are dropped — they were never fetchable.
   *
   * Shape at corpus scale: the capture row rides a struct through
   * `max()`, so the aggregation keeps its PARTIAL phase — each input
   * partition collapses its own re-crawls map-side and only one
   * candidate row per (partition, url) crosses the shuffle, the thing a
   * 30×-recrawled log needs. A `row_number() OVER (PARTITION BY url
   * ORDER BY ts DESC)` would shuffle and sort every capture instead.
   *
   * Determinism: ties on `tsCol` break bytewise on the remaining columns
   * in `df` column order (struct comparison is lexicographic by field).
   * All columns must be orderable (no maps).
   *
   * @return one row per canonical url: `canon_url` + every column of
   *         `df`, the winning capture's values verbatim
   */
  def latestSnapshot(df: DataFrame, urlCol: String, tsCol: String): DataFrame = {
    require(df.columns.contains(urlCol) && df.columns.contains(tsCol),
      s"latestSnapshot needs '$urlCol' and '$tsCol' in ${df.columns.mkString(",")}")
    require(!df.columns.contains("canon_url") && !df.columns.contains("__cap"),
      "latestSnapshot emits 'canon_url' and uses '__cap' internally; " +
        "rename the input's clashing column")
    collapse(
      df.select(canonicalizeUrl(col(urlCol)).as("canon_url") +:
          df.columns.toSeq.map(col(_)): _*)
        .where(col("canon_url").isNotNull),
      tsCol, df.columns.toSeq)
  }

  /**
   * Per-epoch maintenance of a persisted snapshot table: fold a fresh
   * chunk of arrivals into a previous [[latestSnapshot]] output. Newest-
   * capture-wins is a `max`, and max is ASSOCIATIVE and IDEMPOTENT —
   * chunked folds equal the one-pass snapshot (chunked ≡ batch, any
   * chunking), and a RE-DELIVERED arrival is absorbed (`max(x, x) = x`),
   * so unlike count-shaped increments this one needs no disjointness
   * precondition from the exactly-once manifest: replays are harmless.
   *
   * Shape: the fresh chunk collapses to ≤1 row per url map-side before
   * the union, so the re-max shuffles `|snapshot| + |distinct fresh
   * urls|` rows per epoch — never the raw arrival log.
   *
   * @param snapshot a previous [[latestSnapshot]]/[[snapshotIncrement]]
   *                 output (carries `canon_url`); pass an empty one for
   *                 the first epoch
   * @param fresh    raw arrivals, same columns as the original log
   */
  def snapshotIncrement(snapshot: DataFrame, fresh: DataFrame,
      urlCol: String, tsCol: String): DataFrame = {
    val payload = fresh.columns.toSeq
    require(snapshot.columns.toSeq == ("canon_url" +: payload),
      s"snapshot columns ${snapshot.columns.mkString(",")} must be " +
        s"canon_url + fresh's ${payload.mkString(",")}")
    collapse(latestSnapshot(fresh, urlCol, tsCol).unionByName(snapshot),
      tsCol, payload)
  }

  /** Newest capture per `canon_url` of an already-canonicalized log:
    * struct-max keyed on (ts, payload in column order) — the partial-agg
    * core shared by [[latestSnapshot]] and [[snapshotIncrement]]. */
  private def collapse(withCanon: DataFrame, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val capFields = (tsCol +: payload.filterNot(_ == tsCol)).map(col(_))
    withCanon
      .select(col("canon_url"), struct(capFields: _*).as("__cap"))
      .groupBy(col("canon_url"))
      .agg(max(col("__cap")).as("__cap"))
      .select(col("canon_url") +: payload.map(c => col(s"__cap.`$c`").as(c)): _*)
  }

  /**
   * Crawl-to-crawl delta — classify every canonical URL present in
   * either of two crawl snapshots by comparing content fingerprints:
   *
   *   - `added`     — in the current crawl only;
   *   - `gone`      — in the previous crawl only;
   *   - `changed`   — in both, fingerprint differs;
   *   - `unchanged` — in both, fingerprint equal (null-safe): the web
   *     archive's "revisit record", storable as a pointer to the prior
   *     capture instead of a payload — at crawl scale most of the web
   *     is `unchanged`, so this classification IS the storage win.
   *
   * This is the epoch-over-epoch read of the [[latestSnapshot]] /
   * [[snapshotIncrement]] family (the reference's closest device is
   * re-keying re-fetched frames by the same `streamId`,
   * `model/CVParticle.java:41-49`; a crawl pipeline needs the diff made
   * explicit). Feed it two snapshot tables keyed by the same canonical
   * URL — one row per URL per side ([[latestSnapshot]] guarantees
   * exactly that; duplicate keys would cross-multiply in the join).
   *
   * 100 TB shape: ONE full-outer hash equi-join on the key — both
   * sides are corpus-scale crawls, so neither broadcasts; each hash-
   * partitions on `urlCol` once (AQE splits skewed hosts) and the
   * output is one row per URL in either epoch. Presence is tracked by
   * join-side flags, not fingerprint nullness, so a legitimately NULL
   * fingerprint on both sides classifies `unchanged`, and comparison is
   * null-safe `<=>` (one-sided NULL reads `changed`, never NULL).
   * Returns `(urlCol, status, fp_prev, fp_curr)` plus nothing else —
   * join payloads back by URL per side if needed.
   */
  def crawlDelta(prev: DataFrame, curr: DataFrame, urlCol: String,
      fpCol: String): DataFrame = {
    val p = prev.select(col(urlCol), col(fpCol).as("fp_prev"),
      lit(true).as("__in_prev"))
    val c = curr.select(col(urlCol), col(fpCol).as("fp_curr"),
      lit(true).as("__in_curr"))
    p.join(c, Seq(urlCol), "full_outer")
      .withColumn("status",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_curr").isNull, lit("gone"))
          .when(col("fp_prev") <=> col("fp_curr"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(urlCol), col("status"), col("fp_prev"), col("fp_curr"))
  }

  /**
   * Per-URL content change frequency across re-crawls — the recrawl-
   * scheduling signal ([[crawlDelta]]'s longitudinal form): over a log
   * of arrivals `(url, ts, fp)`, counts for each URL its crawls and how
   * often the content fingerprint CHANGED between consecutive arrivals
   * in event-time order, with `change_pm = floor(1000·n_changes /
   * (n_crawls − 1))` (0 for single-crawl URLs — one observation asserts
   * nothing about volatility). A crawler reads this to decide which
   * URLs earn frequent re-fetches and which are static archives.
   * Comparison is null-safe (`IS DISTINCT FROM` — a NULL fingerprint
   * differs from content, matching [[crawlDelta]]'s rule); `tieCol`
   * makes the within-timestamp order total, so the count is
   * deterministic under any partitioning.
   *
   * 100 TB shape: ONE exchange on `urlCol`; the lag/row-number windows
   * and the per-URL aggregation all share that clustering (arrivals per
   * URL are crawl-frequency-bounded, so the per-partition sort is
   * shallow; no global sort, no driver state).
   */
  def changeFrequency(arrivals: DataFrame, urlCol: String, tsCol: String,
      fpCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reserved = Seq("__prev", "__rn")
    require(!arrivals.columns.exists(reserved.contains),
      s"arrivals must not carry reserved columns ${reserved.mkString("/")}")
    val w = Window.partitionBy(col(urlCol)).orderBy(col(tsCol), col(tieCol))
    arrivals
      .withColumn("__prev", lag(col(fpCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(urlCol))
      .agg(count(lit(1)).as("n_crawls"),
        sum(when(col("__rn") > 1 && !(col(fpCol) <=> col("__prev")), 1L)
          .otherwise(0L)).as("n_changes"))
      .withColumn("change_pm",
        when(col("n_crawls") > 1,
          floor(lit(1000) * col("n_changes") / (col("n_crawls") - 1)))
          .otherwise(lit(0)).cast(org.apache.spark.sql.types.LongType))
  }

  /**
   * Robots-exclusion verdicts (RFC 9309 core) — the crawl-compliance
   * gate a Common-Crawl-style pipeline applies before fetching or
   * admitting a page. `robots` is the parsed per-host rule table
   * `(host, prefix, allow)` (one row per Allow/Disallow line for the
   * crawler's user-agent group); a path matches a rule when it
   * STARTS WITH the rule's prefix, and per the RFC the MOST SPECIFIC
   * (longest-prefix) match wins, with the LEAST RESTRICTIVE (allow)
   * rule winning length ties. A (host, path) matching no rule — or a
   * host with no robots rows at all — defaults to allowed. Literal
   * prefixes only: the `*`/`$` wildcard extension is a documented
   * non-goal (wildcard rules expand to regexes that neither engine's
   * prefix machinery can index; the RFC's own core grammar is literal).
   *
   * Returns one verdict row per DISTINCT (host, path): `(hostCol,
   * pathCol, allowed)` — verdicts are per-URL facts, so callers join
   * them back to page-scale data (or feed [[canonicalizeUrl]] output).
   *
   * 100 TB shape: one equi-join on `host` (both sides hash-partitioned;
   * candidate fan-out = rules-per-host, ~10) and one partial-aggregated
   * struct-max per (host, path) — the winner is `max(struct(prefix_len,
   * allow))`, so each partition collapses its own candidates map-side;
   * no window, no driver state. Rule tables are host-scale (can exceed
   * broadcast), hence the shuffled join, exactly like the rare-token
   * lexicon join.
   */
  def robotsVerdicts(pages: DataFrame, hostCol: String, pathCol: String,
      robots: DataFrame): DataFrame = {
    require(robots.columns.toSeq == Seq("host", "prefix", "allow"),
      s"robots table must be (host, prefix, allow); got ${robots.columns.toSeq}")
    val rh = "__graft_rhost"; val rp = "__graft_prefix"; val ra = "__graft_allow"
    require(!pages.columns.exists(Seq(rh, rp, ra).contains),
      s"pages must not carry reserved columns $rh/$rp/$ra")
    val pg = pages.select(col(hostCol), col(pathCol)).distinct()
    val rules = robots.select(col("host").as(rh), col("prefix").as(rp),
      col("allow").as(ra))
    val winner = pg.join(rules, pg(hostCol) === col(rh))
      .where(col(pathCol).startsWith(col(rp)))
      .groupBy(col(hostCol), col(pathCol))
      .agg(max(struct(length(col(rp)).as("l"),
        col(ra).cast(org.apache.spark.sql.types.IntegerType).as("a"))).as("__w"))
      .select(col(hostCol), col(pathCol), (col("__w.a") === 1).as("__rule_allow"))
    pg.join(winner, Seq(hostCol, pathCol), "left")
      .withColumn("allowed", coalesce(col("__rule_allow"), lit(true)))
      .drop("__rule_allow")
  }
}
