package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Request/response query service — the Spark transposition of the
 * reference's DRPC plane (SURVEY.md §3.3): `RequestBolt` →
 * `FeatureExtractionOp` → allGrouping `PartialMatcher` shards →
 * `BatchBolt` per-request aggregation
 * (`stormcv-examples/.../drpc/E8_DRPCTopology.java:60-70`,
 * `drpc/PartialMatcher.java:51-271`, `drpc/BatchBolt.java:63-99`).
 *
 * Where Storm replicated every query to all matcher tasks holding corpus
 * shards, Spark **broadcasts the (small) request batch** and scans the
 * (large, partitioned) corpus once — the identical shard-and-merge
 * dataflow, planned as a BroadcastNestedLoopJoin + per-request top-k.
 * `request_id` threads through every row like `CVParticle.requestId`
 * (`model/CVParticle.java:27`).
 */
object RequestResponse {

  /**
   * Text match service: for each (request_id, query_text), return the
   * top-k most similar corpus docs by word-shingle containment score
   * (quantized: floor(1000·|Q∩D|/|Q|), ties by doc id).
   */
  def matchText(spark: SparkSession, requests: DataFrame, corpus: DataFrame,
      reqId: String, reqText: String, docId: String, docText: String,
      k: Int = 5, n: Int = 2): DataFrame = {
    val qSh = Dedup.shingles(
      requests.select(col(reqId).as("request_id"), col(reqText).as("text")),
      "request_id", "text", n)
    val qSize = qSh.groupBy(col("request_id")).agg(count(lit(1)).as("q_sz"))
    val dSh = Dedup.shingles(
      corpus.select(col(docId).as("doc_id"), col(docText).as("text")),
      "doc_id", "text", n)
    // the request side is tiny: broadcast it to every corpus partition
    val hits = dSh.join(broadcast(qSh), Seq("shingle"))
      .groupBy(col("request_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = hits.join(broadcast(qSize), Seq("request_id"))
      .select(col("request_id"), col("doc_id"),
        floor(lit(1000) * col("inter") / col("q_sz")).cast(LongType).as("score_q"))
    // per-request barrier agg (BatchBolt analog): bounded partial top-k
    TopK.perKey(scored, "request_id", "doc_id", "score_q", k, "doc_id", "score_q")
  }

  /**
   * Incremental inverted-shingle-index maintenance: shingle ONLY a new
   * corpus chunk (e.g. the epochs `ExactlyOnceSink.readBetween` returned
   * since the last run) into `(doc_id, shingle)` rows to append to the
   * persisted index table. Shingling is row-local per doc (distinct
   * within the doc), so chunked builds equal the single-batch build
   * exactly — and once the index is persisted, [[matchTextFromIndex]]
   * serves every request batch WITHOUT touching the corpus text again.
   * This is the text-side transposition of `PartialMatcher.java:110-145`
   * (index built at `prepare`, queried forever). At web scale, cap hot
   * shingles at build time with [[Dedup.cappedShingles]] semantics if
   * the corpus carries boilerplate (the index then defines the scoring
   * universe, exactly as q20/q21 document for the batch pipeline).
   */
  def textIndexIncrement(chunk: DataFrame, docId: String, docText: String,
      n: Int = 2): DataFrame =
    Dedup.shingles(
      chunk.select(col(docId).as("doc_id"), col(docText).as("text")),
      "doc_id", "text", n)

  /**
   * Text match served off a PRE-BUILT inverted shingle index
   * `(doc_id, shingle)` — value-identical to [[matchText]] when the
   * index covers the corpus (spec-asserted: the scoring formula is the
   * same `floor(1000·|Q∩D|/|Q|)` over the same distinct-shingle rows;
   * only where the doc shingles COME FROM differs). Per trigger the
   * request batch is shingled (tiny, row-local) and broadcast; the
   * corpus contributes one equi-join scan of the index — it is never
   * re-shingled, never shuffled.
   */
  def matchTextFromIndex(requests: DataFrame, shingleIndex: DataFrame,
      reqId: String, reqText: String, k: Int = 5, n: Int = 2): DataFrame = {
    val qSh = Dedup.shingles(
      requests.select(col(reqId).as("request_id"), col(reqText).as("text")),
      "request_id", "text", n)
    val qSize = qSh.groupBy(col("request_id")).agg(count(lit(1)).as("q_sz"))
    val hits = shingleIndex.select(col("doc_id"), col("shingle"))
      .join(broadcast(qSh), Seq("shingle"))
      .groupBy(col("request_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = hits.join(broadcast(qSize), Seq("request_id"))
      .select(col("request_id"), col("doc_id"),
        floor(lit(1000) * col("inter") / col("q_sz")).cast(LongType).as("score_q"))
    TopK.perKey(scored, "request_id", "doc_id", "score_q", k, "doc_id", "score_q")
  }

  /**
   * Span-duplication probe — the span-level ingest-gate question "how
   * much of this candidate document already exists VERBATIM in the
   * corpus?", answered off the persisted `(span_hash, n_docs)` table
   * that [[Dedup.spanStatsIncrement]] maintains. One row per request
   * that has at least one n-token span: `(request_id, n_spans,
   * dup_spans, dup_q = floor(1000·dup_spans/n_spans))`. Counts are over
   * the request's DISTINCT n-token windows ([[Dedup.spanHashRows]]
   * dedups within doc) — dup_q 1000 means every distinct window of the
   * request already exists somewhere.
   *
   * 100 TB shape: request spans are hashed rowwise and BROADCAST — note
   * that is requests × distinct-windows rows, sized for the streaming
   * per-trigger use (a handful of candidate docs per trigger); a batch
   * caller probing many long documents at once should drop the hint and
   * let the probe run as a shuffled equi-join instead. The one join is a
   * hash-equi probe into the index scan — corpus text is never touched,
   * nothing corpus-scale shuffles. Requests shorter than n tokens
   * produce no row (no spans to gate on — the caller's length gate
   * fires first anyway).
   */
  def spanDupProbe(requests: DataFrame, spanDf: DataFrame,
      reqId: String, reqText: String, n: Int = 8): DataFrame = {
    val req = requests.select(col(reqId).as("request_id"),
      col(reqText).as("text"))
    val spans = Dedup.spanHashRows(req, "request_id", "text", n)
    val sz = spans.groupBy(col("request_id")).agg(count(lit(1)).as("n_spans"))
    val hits = spanDf.select(col("span_hash"))
      .join(broadcast(spans), Seq("span_hash"))
      .groupBy(col("request_id")).agg(count(lit(1)).as("hit_spans"))
    sz.join(hits, Seq("request_id"), "left")
      .select(col("request_id"), col("n_spans"),
        coalesce(col("hit_spans"), lit(0L)).as("dup_spans"),
        floor(lit(1000) * coalesce(col("hit_spans"), lit(0L)) / col("n_spans"))
          .cast(LongType).as("dup_q"))
  }

  /**
   * Rare-token (OOV) gate probe — the ingest-time form of
   * [[TextAnalysis.rareTokenStats]]: "how much of this candidate
   * document is vocabulary the corpus lexicon has never (or rarely)
   * seen?", answered off the persisted `(term, tf)` table that
   * [[TextAnalysis.lexiconIncrement]] maintains. One row per request:
   * `(request_id, n_toks, rare_toks, rare_q = floor(1000·rare/n))`,
   * tokens counted WITH multiplicity; a token is rare iff its lexicon
   * `tf` is absent or `< minTf` — identical semantics to the batch
   * operator (spec-asserted on the same inputs).
   *
   * 100 TB shape: the request batch's distinct (request, term, cnt)
   * rows are BROADCAST into the frequent slice of the lexicon scan —
   * sized for the streaming per-trigger use (a handful of candidate
   * docs per trigger); a batch caller probing a large request set
   * should use [[TextAnalysis.rareTokenStats]]'s shuffled join instead.
   * The lexicon itself is never shuffled or broadcast.
   */
  def rareTokenProbe(requests: DataFrame, lexicon: DataFrame,
      reqId: String, reqText: String, minTf: Long): DataFrame = {
    require(minTf >= 1, "minTf must be >= 1")
    // NULL text → [""] like rareTokenStats: a request must never vanish
    // from the response (a service caller would wait forever on its id)
    val req = requests.select(col(reqId).as("request_id"),
      coalesce(col(reqText), lit("")).as("text"))
    val terms = req.select(col("request_id"),
        explode(TextAnalysis.wordArray(col("text"))).as("term"))
      .groupBy(col("request_id"), col("term")).agg(count(lit(1)).as("cnt"))
    val sz = terms.groupBy(col("request_id")).agg(sum(col("cnt")).as("n_toks"))
    val known = lexicon.where(col("tf") >= minTf).select(col("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("request_id")).agg(sum(col("cnt")).as("known_toks"))
    sz.join(known, Seq("request_id"), "left")
      .select(col("request_id"), col("n_toks"),
        (col("n_toks") - coalesce(col("known_toks"), lit(0L))).as("rare_toks"))
      .withColumn("rare_q",
        floor(lit(1000) * col("rare_toks") / col("n_toks")).cast(LongType))
  }

  /**
   * Near-duplicate probe served off the persisted minhash band index
   * `(doc_id, band, sig)` that [[Dedup.incrementalNearDupKeepers]]
   * maintains: request texts build their band signatures ROWWISE
   * ([[MinHashBandSigs]], stateless codegen'd projection), candidates
   * are the docs sharing ≥ 1 band bucket (index equi-join — the corpus
   * is never re-shingled wholesale), and the exact quantized Jaccard is
   * verified on the CANDIDATE SET ONLY: just the candidate docs' texts
   * are fetched (semi-join point lookup — prunable on a bucketed table)
   * and shingled. Returns (request_id, doc_id, jacc_q ≥ minJaccQ).
   *
   * Same candidate-generation/verification split as
   * [[Dedup.minhashLshPairs]], so the answer is exact with respect to
   * the LSH candidate definition (bucket mates), not an unverified
   * sketch.
   */
  def nearDupProbe(requests: DataFrame, bandIndex: DataFrame, corpus: DataFrame,
      reqId: String, reqText: String, docId: String, docText: String,
      n: Int = 3, bands: Int = 8, minJaccQ: Long = 500L): DataFrame = {
    val req = requests.select(col(reqId).as("request_id"), col(reqText).as("text"))
    val probes = Dedup.minhashBandsRowwise(req, "request_id", "text", n, bands)
    val cands = probes
      .join(bandIndex.select(col(docId).as("doc_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select(col("request_id"), col("doc_id")).distinct()
    val qSh = Dedup.shingles(req, "request_id", "text", n)
    val qSz = qSh.groupBy(col("request_id")).agg(count(lit(1)).as("q_sz"))
    // fetch + shingle ONLY the candidate docs
    val candTexts = corpus.select(col(docId).as("doc_id"), col(docText).as("text"))
      .join(cands.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val dSh = Dedup.shingles(candTexts, "doc_id", "text", n)
    val dSz = dSh.groupBy(col("doc_id")).agg(count(lit(1)).as("d_sz"))
    val inter = cands
      .join(broadcast(qSh), Seq("request_id"))
      .join(dSh, Seq("doc_id", "shingle"))
      .groupBy(col("request_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    inter.join(broadcast(qSz), Seq("request_id"))
      .join(dSz, Seq("doc_id"))
      .select(col("request_id"), col("doc_id"),
        floor(lit(1000) * col("inter") / (col("q_sz") + col("d_sz") - col("inter")))
          .cast(LongType).as("jacc_q"))
      .where(col("jacc_q") >= minJaccQ)
  }

  /**
   * Embedding match service (PartialMatcher's descriptor-space kNN):
   * requests broadcast, corpus scanned, quantized-cosine top-k per
   * request — delegates to [[Similarity.bruteForceTopK]].
   */
  def matchEmbedding(requests: DataFrame, corpus: DataFrame,
      reqId: String, reqVec: String, docId: String, docVec: String,
      k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(requests, corpus, reqId, docId, reqVec, docVec, k)
      .withColumnRenamed("query_id", "request_id")

  /**
   * Ingest-time semantic admission gate over TEXT — the full-rate form
   * of [[semDedupProbe]] for pipelines with no model-served embedding
   * column: each candidate doc is feature-hashed row-locally
   * ([[TextAnalysis.hashedTfVector]], cast to float) and probed against
   * the persisted kept-vector history; only ADMITTED input rows return
   * (left-semi on the id). A row whose hashed vector cancels to exactly
   * zero is admitted — the zero-guarded cosine scores it 0 from
   * everything (it can neither claim nor be claimed), so no separate
   * branch is needed and the featurization subtree appears ONCE in the
   * plan (a zero-norm split branch would duplicate it — Catalyst does
   * not share unmaterialized subplans; end-to-end the gate is
   * join-bound, so the win is plan hygiene more than throughput).
   *
   * 100 TB shape: what broadcasts is the batch's hashed+assigned
   * vectors — at gate-sized `dim` (tens) a 10⁵-page trigger is a few
   * MB, which is why this full-rate gate can keep semDedupProbe's
   * history-probed-in-place join while the text-based probes
   * (rare-token, span) must switch to shuffled joins at full rate. The
   * history table is scanned once per trigger, never shuffled —
   * cache/persist it. `dim` must match the history/seeds artifacts
   * (ragged arrays would silently truncate the dot product — the app
   * validates at startup).
   */
  def semDedupGateKeep(batch: DataFrame, history: DataFrame,
      seeds: DataFrame, idCol: String, textCol: String, dim: Int,
      minCosQ: Long): DataFrame = {
    val vecs = TextAnalysis.hashedTfVector(
        batch.select(col(idCol), col(textCol)), idCol, textCol, dim)
      .select(col(idCol), col("tf_vec").cast("array<float>").as("__vec"))
    val admitted = semDedupProbe(vecs, history, seeds, idCol, "__vec",
        minCosQ)
      .where(col("admit")).select(col("request_id").as(idCol))
    batch.join(admitted, Seq(idCol), "left_semi")
  }

  /**
   * The distinct argmax cells of a (tiny) request batch — collected to
   * the driver so a centroid-PARTITIONED history table can be pruned
   * with a LITERAL `isin` before [[semDedupProbe]] scans it. Spark's
   * dynamic partition pruning declines this join (the request side
   * carries no selective predicate, so the DPP benefit heuristic never
   * fires — measured), and without pruning every trigger scans the full
   * corpus-scale history table's file listing. One collect of ≤
   * |seeds| longs per trigger is the price; only worth it when the
   * request batch probes a few cells (the per-trigger gate), not a
   * full-rate batch whose cells cover the table anyway.
   */
  def requestCells(requests: DataFrame, seeds: DataFrame,
      reqId: String, reqVec: String): Seq[Long] = {
    val req = requests.select(col(reqId).as("corpus_id"),
      col(reqVec).as("cv"), VectorOps.norm_q(col(reqVec)).as("cn"))
    Similarity.assignWithScore(req, seeds)
      .select(col("centroid")).distinct()
      .collect().map(_.getLong(0)).toSeq
  }

  /**
   * SemDeDup admission probe — the ingest-gate form of
   * [[Similarity.semDedupIncrement]]: "does this candidate's embedding
   * already have a KEPT semantic near-twin in the corpus?", answered off
   * the persisted kept-vector history ([[Similarity.semDedupAssigned]]'s
   * kept rows, `(corpus_id, cv, cn, centroid)`) under the frozen
   * centroid table. One row per request: `(request_id, centroid, cos_c,
   * near_max_q, admit)` — `near_max_q` is the max quantized cosine to
   * any kept cell-mate (NULL when the request's cell holds none),
   * `admit` iff that max is NULL or below `minCosQ`. A replayed
   * already-kept vector finds ITSELF at cos 1e6 and is refused — the
   * same replay-absorption semantics as the increment.
   *
   * The probe judges each request INDEPENDENTLY against history only
   * (no within-batch rank pass): it answers "would this single
   * candidate be admitted right now". Folding an admitted batch that
   * may contain internal near-twins is the maintenance job —
   * [[Similarity.semDedupIncrement]] applies the batch rank rule there.
   *
   * 100 TB shape: requests are assigned row-locally against the
   * broadcast seeds, then BROADCAST into one equi-join probing the
   * history scan on `centroid` (partition history by centroid — the
   * probe prunes to the request cells); nothing corpus-scale shuffles
   * per trigger.
   *
   * PRECONDITION: `seeds` must be non-empty — with zero seeds nothing
   * can be assigned, so the probe emits ZERO rows (and a gate built on
   * it refuses everything). The service/app entry points validate this
   * once at start; ad-hoc callers should too.
   */
  def semDedupProbe(requests: DataFrame, history: DataFrame,
      seeds: DataFrame, reqId: String, reqVec: String,
      minCosQ: Long): DataFrame = {
    val req = requests.select(col(reqId).as("corpus_id"),
      col(reqVec).as("cv"), VectorOps.norm_q(col(reqVec)).as("cn"))
    val a = Similarity.assignWithScore(req, seeds)
    val near = history
      .select(col("centroid"), col("cv").as("mv"), col("cn").as("mn"))
      .join(broadcast(a.select(col("centroid"), col("corpus_id"),
        col("cv"), col("cn"))), Seq("centroid"))
      .groupBy(col("corpus_id"))
      .agg(max(Similarity.cosQ(VectorOps.dot_q(col("cv"), col("mv")),
        col("cn"), col("mn"))).as("near_max_q"))
    a.join(near, Seq("corpus_id"), "left")
      .select(col("corpus_id").as("request_id"), col("centroid"),
        col("cos_c"), col("near_max_q"),
        (col("near_max_q").isNull || col("near_max_q") < minCosQ)
          .as("admit"))
  }

  /**
   * LM quality probe — the ingest-gate form of the CCNet LM filter:
   * score a request batch against the PERSISTED bigram model and emit
   * `(request_id, n_bigrams, lm_q, tier)`. Value-identical to
   * [[LanguageModel.scoreDocs]] + [[LanguageModel.tierByCutoffs]]
   * (spec- and oracle-asserted), but shaped for serving: the request
   * batch is BROADCAST into two inner equi-joins against the enriched
   * model ([[LanguageModel.enrichModel]]: `(bg, c2, c1)`) and the
   * left-context table ([[LanguageModel.c1Of]]), with the exact smoothed
   * sum reconstructed arithmetically —
   *
   *   S = Σ_seen-bigram p(c2,c1) + [Σ_seen-w1 p(0,c1) − Σ_seen-bigram p(0,c1)]
   *       + (n − |seen-w1|) · p(0,0)
   *
   * — because a LEFT join (what the batch scorer uses for unseen
   * bigrams) cannot broadcast its small probe side, and shuffling the
   * model-scale table every trigger is the thing a serving tier must
   * never do. Model text is never rescanned; both joins probe cached
   * maintenance artifacts; `vocabPlus1` is frozen driver-side at service
   * start ([[LanguageModel.vocabPlusOne]]).
   *
   * Requests with fewer than two tokens (nothing to predict) still get a
   * row — `n_bigrams = 0`, `lm_q`/`tier` NULL — a gate caller must never
   * wait forever on its request id; NULL marks "length-gate territory,
   * not scored". NULL text is treated as empty.
   */
  def lmScoreProbe(requests: DataFrame, enrichedModel: DataFrame,
      c1: DataFrame, vocabPlus1: Long, reqId: String, reqText: String,
      headMin: Long, midMin: Long): DataFrame = {
    require(vocabPlus1 >= 1, "vocabPlus1 must be >= 1")
    val req = requests.select(col(reqId).as("request_id"),
      coalesce(col(reqText), lit("")).as("text"))
    val dbg = LanguageModel.bigramRows(req, "request_id", "text")
      .withColumnRenamed("doc_id", "request_id")
    val n = dbg.groupBy("request_id").agg(count(lit(1)).as("n_bigrams"))
    val scored = probeLmScore(dbg, n, enrichedModel, c1, vocabPlus1, "lm_q")
    val tiered = LanguageModel.tierByCutoffs(scored, headMin, midMin)
    req.select(col("request_id")).distinct()
      .join(broadcast(tiered), Seq("request_id"), "left")
      .select(col("request_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_q"),
        when(col("lm_q").isNull, lit(null).cast(StringType))
          .otherwise(col("tier")).as("tier"))
  }

  /** The broadcast-decomposed smoothed-likelihood reconstruction shared
   *  by [[lmScoreProbe]] and [[dsirProbe]] (see lmScoreProbe's doc for
   *  the S = seen + left-context-only + unseen arithmetic): request
   *  bigram rows `dbg` + per-request totals `n` against ONE model's
   *  serving artifacts, returning `(request_id, n_bigrams, <out>)`. */
  private def probeLmScore(dbg: DataFrame, n: DataFrame,
      enrichedModel: DataFrame, c1: DataFrame, vocabPlus1: Long,
      out: String): DataFrame = {
    // seen-bigram rows: full p and the matching left-context-only p
    val j2 = enrichedModel.join(broadcast(dbg.drop("w1")), Seq("bg"))
      .groupBy("request_id").agg(
        sum(expr(s"1000000 * (c2 + 1) div (c1 + $vocabPlus1)")).as("s2"),
        sum(expr(s"1000000 div (c1 + $vocabPlus1)")).as("t2"))
    // seen-left-context rows (superset of seen-bigram rows)
    val j1 = c1.join(broadcast(dbg.drop("bg")), Seq("w1"))
      .groupBy("request_id").agg(
        sum(expr(s"1000000 div (c1 + $vocabPlus1)")).as("t1"),
        count(lit(1)).as("m1"))
    val pUnseen = 1000000L / vocabPlus1
    n.join(j1, Seq("request_id"), "left")
      .join(j2, Seq("request_id"), "left")
      .select(col("request_id"), col("n_bigrams"),
        (coalesce(col("s2"), lit(0L)) +
          (coalesce(col("t1"), lit(0L)) - coalesce(col("t2"), lit(0L))) +
          (col("n_bigrams") - coalesce(col("m1"), lit(0L))) * lit(pUnseen))
          .as("__s"))
      // integer div, matching the batch scorer's lm_q exactly (Column `/`
      // is double division — it would drift from the oracle at the ulp)
      .select(col("request_id"), col("n_bigrams"),
        expr("__s div n_bigrams").as(out))
  }

  /**
   * DSIR importance probe — the serving form of
   * [[LanguageModel.importanceWeights]]: score a request batch against
   * TWO persisted model artifact sets (target and raw; each the
   * [[LanguageModel.enrichModel]] / [[LanguageModel.c1Of]] /
   * [[LanguageModel.vocabPlusOne]] triple, derived once per maintenance
   * epoch) and emit `(request_id, n_bigrams, w_target, w_raw, dsir_q)`.
   * Value-identical to the batch operator (spec- and oracle-asserted).
   * The request batch is tokenized ONCE; each model is probed with the
   * same broadcast-decomposed reconstruction as [[lmScoreProbe]] —
   * neither model-scale table is ever shuffled per trigger.
   *
   * Unscoreable requests (fewer than two tokens) still get a row:
   * `n_bigrams = 0`, scores NULL — same contract as [[lmScoreProbe]].
   */
  def dsirProbe(requests: DataFrame,
      targetEnriched: DataFrame, targetC1: DataFrame, targetVocabPlus1: Long,
      rawEnriched: DataFrame, rawC1: DataFrame, rawVocabPlus1: Long,
      reqId: String, reqText: String): DataFrame = {
    require(targetVocabPlus1 >= 1 && rawVocabPlus1 >= 1,
      "vocabPlus1 must be >= 1")
    val req = requests.select(col(reqId).as("request_id"),
      coalesce(col(reqText), lit("")).as("text"))
    val dbg = LanguageModel.bigramRows(req, "request_id", "text")
      .withColumnRenamed("doc_id", "request_id")
    val n = dbg.groupBy("request_id").agg(count(lit(1)).as("n_bigrams"))
    val t = probeLmScore(dbg, n, targetEnriched, targetC1,
      targetVocabPlus1, "w_target")
    val r = probeLmScore(dbg, n, rawEnriched, rawC1,
      rawVocabPlus1, "w_raw").drop("n_bigrams")
    val scored = t.join(r, Seq("request_id"))
      .select(col("request_id"), col("n_bigrams"),
        col("w_target"), col("w_raw"),
        (col("w_target") - col("w_raw")).as("dsir_q"))
    req.select(col("request_id")).distinct()
      .join(broadcast(scored), Seq("request_id"), "left")
      .select(col("request_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("w_target"), col("w_raw"), col("dsir_q"))
  }
}
