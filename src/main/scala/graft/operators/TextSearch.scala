package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Keyword search (BM25) over a persisted inverted postings index — the
 * canonical text-serving workload over a web corpus, and the third
 * prepare-time index of the engine next to the shingle index
 * ([[RequestResponse.textIndexIncrement]]) and the minhash band index
 * ([[Dedup.incrementalNearDupKeepers]]).
 *
 * Reference analog: `PartialMatcher.java:110-145` builds its prototype
 * feature index once at `prepare` and serves every DRPC request off it;
 * this is the same shape for term search — the corpus is tokenized ONCE
 * into `(doc_id, term, tf, dl)` postings (row-local per doc, so
 * incremental chunks are exactly union-composable), and a request batch
 * touches the index with one broadcast equi-join on `term`: the raw text
 * is never rescanned, never reshuffled. At 100 TB the postings table is
 * the thing you bucket by `term` (equi-join locality) and serve from;
 * `df`/corpus stats are maintenance-time artifacts refreshed per append,
 * not per query.
 *
 * Scoring is BM25 (k1 = 1.2, b = 0.75) made bit-portable: every factor is
 * integer arithmetic — transcendental `ln` is NOT reproducible across
 * engines at the last ulp, so the idf keeps the Robertson–Spärck Jones
 * odds ratio un-logged and quantized,
 * `idf_q = (2N − 2df + 1)·10^6 div (2df + 1)` (monotone in df, exact in
 * both engines), and the tf saturation multiplies through by the
 * integerized average document length `avgdl_q = S div N`:
 *
 *   sat_q = (1000·22·tf·avgdl_q) div (10·avgdl_q·tf + 3·avgdl_q + 9·dl)
 *
 * which is `floor(1000 · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl_q)))`
 * in pure int64. Per-term contribution `idf_q·sat_q ≤ 2·10^6·N·2200`, so
 * int64 is exact up to N ≈ 10^9 docs per index shard; beyond that, cast
 * the product to DecimalType(38,0) (one-line change) — the oracle side is
 * HUGEINT-ready.
 */
object TextSearch {

  /** Same tokenizer as [[Dedup.shingles]]: whitespace split after trim. */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /**
   * Postings rows for a corpus chunk: `(doc_id, term, tf, dl)` — tf the
   * in-doc term count, dl the doc token length (denormalized onto every
   * row so scoring never joins a separate lengths table). Tokenization
   * and counting are row-local per doc, so chunked builds (one call per
   * `ExactlyOnceSink.readBetween` batch, appended to the index table)
   * equal the single-batch build exactly — spec-asserted.
   */
  def postingsIncrement(chunk: DataFrame, docId: String, textCol: String): DataFrame =
    chunk.select(col(docId).as("doc_id"), toks(col(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast(LongType).as("dl"),
        explode(col("ts")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))

  /**
   * Corpus statistics off the postings index (one aggregation pass over
   * `(doc_id, dl)`, no raw text): 1 row `(n, s, avgdl_q)` with
   * `avgdl_q = s div n`. A maintenance-time artifact: refresh per index
   * append, broadcast at query time.
   */
  def statsOf(postings: DataFrame): DataFrame =
    postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
      .select(col("n"), col("s"), expr("s div n").as("avgdl_q"))

  /**
   * Document frequency per term off the postings index (postings are one
   * row per (doc, term), so `df = count(*)`). Maintenance-time artifact;
   * at query time only the requested terms' rows are needed (semi-join
   * before broadcast).
   */
  def termDf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /**
   * Query-term extraction: the DISTINCT terms among the first `maxTerms`
   * tokens of each request text → `(request_id, term)`. Row-local, tiny,
   * broadcast by [[bm25TopK]].
   */
  def queryTerms(requests: DataFrame, reqId: String, textCol: String,
      maxTerms: Int): DataFrame =
    requests.select(col(reqId).as("request_id"),
        explode(slice(toks(col(textCol)), 1, maxTerms)).as("term"))
      .distinct()

  /**
   * BM25 top-k served off the postings index: requests broadcast, one
   * equi-join scan of postings on `term`, per-(request, doc) integer
   * score sum, bounded-heap top-k (ties by doc id). `dfT`/`stats` are the
   * maintenance artifacts ([[termDf]]/[[statsOf]]) — pass them persisted;
   * the full index is never re-aggregated per request batch.
   */
  def bm25TopK(queryTerms: DataFrame, postings: DataFrame, dfT: DataFrame,
      stats: DataFrame, k: Int): DataFrame = {
    // df rows for the query's terms only — tiny after the semi-join
    val qdf = dfT.join(queryTerms.select(col("term")).distinct(),
      Seq("term"), "left_semi")
    val contrib = postings
      .join(broadcast(queryTerms), Seq("term"))
      .join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("request_id"), col("doc_id"),
        (expr("(2*n - 2*df + 1) * 1000000 div (2*df + 1)") *
         expr("(1000 * 22 * tf * avgdl_q) div (10 * avgdl_q * tf + 3 * avgdl_q + 9 * dl)"))
          .as("c"))
    val scored = contrib.groupBy(col("request_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_q"))
    TopK.perKey(scored, "request_id", "doc_id", "score_q", k, "doc_id", "score_q")
  }

  // ==========================================================================
  // Positional index + phrase search
  // ==========================================================================

  /**
   * Positional postings for a corpus chunk: `(doc_id, pos, term)` with
   * 1-based token position — the second index flavor next to the
   * tf-postings of [[postingsIncrement]], enabling exact phrase queries.
   * Row-local per doc like every `*Increment` here, so chunked builds
   * (one call per `ExactlyOnceSink.readBetween` batch, appended) equal
   * the single-batch build exactly. At 100 TB this table is bucketed by
   * `term` (same locality story as the tf index); it is ~`dl` rows per
   * doc instead of ~distinct-terms, the classic positional-index size
   * trade.
   */
  def positionsIncrement(chunk: DataFrame, docId: String, textCol: String): DataFrame =
    chunk.select(col(docId).as("doc_id"), posexplode(toks(col(textCol))).as(Seq("p0", "term")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("pos"), col("term"))

  /**
   * COMPACT positional postings: one row per (doc, term) with the sorted
   * 1-based position ARRAY — the standard positional-index compression
   * (one entry per distinct term instead of one per token, ~dl /
   * distinct-terms smaller; on web text typically 2–4×, and the hot
   * stopword rows collapse hardest). This is the layout to persist and
   * bucket by `term` at 100 TB: what shuffles into the index build and
   * what the phrase probe scans both shrink by the same factor.
   *
   * Still per-doc row-local in effect (the groupBy key includes doc_id,
   * so partial aggregation completes map-side for docs that don't span
   * input splits): chunked builds over disjoint doc sets equal the
   * single-batch build exactly — spec-asserted, as is
   * `phraseMatchesCompact` ≡ [[phraseMatches]] over the row layout.
   */
  def positionsCompactIncrement(chunk: DataFrame, docId: String,
      textCol: String): DataFrame =
    positionsIncrement(chunk, docId, textCol)
      .groupBy(col("doc_id"), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /**
   * Phrase-request decomposition: `(request_id, offset, term, plen)` —
   * one row per token of the phrase with its 0-based in-phrase offset and
   * the phrase length denormalized on. Row-local, tiny, broadcast by
   * [[phraseMatches]].
   */
  def phraseQueryTerms(requests: DataFrame, reqId: String, phraseCol: String): DataFrame =
    requests.select(col(reqId).as("request_id"), toks(col(phraseCol)).as("ts"))
      .select(col("request_id"), size(col("ts")).cast(LongType).as("plen"),
        posexplode(col("ts")).as(Seq("offset", "term")))
      .select(col("request_id"), col("offset").cast(LongType).as("offset"),
        col("term"), col("plen"))

  /**
   * Exact phrase occurrences served off the positional index, purely
   * relationally: a token at position `pos` matching phrase offset `o`
   * votes for candidate start `pos − o`; a start where ALL `plen`
   * offsets voted is an occurrence. One broadcast equi-join of the
   * (tiny) phrase-term table against the positions index on `term`, one
   * aggregation per candidate start, one per (request, doc) — the raw
   * text is never rescanned and nothing quadratic forms (`countDistinct`
   * on `offset` makes repeated-word phrases count each start once per
   * offset, not per matching-token pair). Returns
   * `(request_id, doc_id, n_occ, first_pos)` for docs with ≥1 occurrence.
   */
  def phraseMatches(phraseTerms: DataFrame, positions: DataFrame): DataFrame =
    voteAndCount(positions.join(broadcast(phraseTerms), Seq("term"))
      .select(col("request_id"), col("doc_id"), (col("pos") - col("offset")).as("start"),
        col("offset"), col("plen")))

  /**
   * [[phraseMatches]] served off the COMPACT layout
   * ([[positionsCompactIncrement]]): the broadcast equi-join on `term`
   * FILTERS to the phrase's terms first, and only those survivors'
   * position arrays are exploded back into votes — the token-level
   * explode happens on a sliver (candidate terms only), never on the
   * index scan. Same output as the row layout by construction.
   */
  def phraseMatchesCompact(phraseTerms: DataFrame, positions: DataFrame): DataFrame =
    voteAndCount(positions.join(broadcast(phraseTerms), Seq("term"))
      .select(col("request_id"), col("doc_id"),
        explode(col("positions")).as("pos"), col("offset"), col("plen"))
      .select(col("request_id"), col("doc_id"), (col("pos") - col("offset")).as("start"),
        col("offset"), col("plen")))

  /** Shared vote tail: starts where ALL plen offsets voted → occurrences. */
  private def voteAndCount(votes: DataFrame): DataFrame =
    votes
      .groupBy(col("request_id"), col("doc_id"), col("start"), col("plen"))
      .agg(countDistinct(col("offset")).as("hits"))
      .where(col("hits") === col("plen"))
      .groupBy(col("request_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("start")).as("first_pos"))
}
