package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * N-gram language-model quality filtering — the CCNet-style "perplexity
 * gate": train a bigram model on a reference slice of the corpus, score
 * every document by how well the model predicts it, and bucket the
 * corpus into head/middle/tail quality tiers. This is the canonical
 * model-based quality signal of a web-scale training-data pipeline,
 * sitting next to the heuristic gates ([[TextAnalysis.qualitySignals]],
 * word-repetition, mojibake) as the learned one.
 *
 * Reference analog: `operation/HaarCascadeOp.java:99-117` — a model
 * trained OFFLINE is loaded once at `prepare` and applied per tuple,
 * never retrained in the hot path. Same split here: [[bigramIncrement]]
 * / [[foldCounts]] build and maintain the model table at prepare /
 * maintenance time (union-composable per ingest epoch, like
 * [[TextSearch.postingsIncrement]]), and [[scoreDocs]] applies it with
 * two hash equi-joins — corpus text is tokenized exactly once, the model
 * is never rebuilt per query.
 *
 * Scoring is bit-portable across engines (the driver's DuckDB oracle
 * rebuilds it digit-for-digit): transcendental `ln`/`exp` are NOT
 * reproducible at the last ulp, so instead of log-space perplexity the
 * score is the Laplace-smoothed bigram likelihood quantized to parts
 * per million, averaged arithmetically over the document's bigrams —
 *
 *   p_q(w1 w2) = 10^6 · (c2(w1,w2) + 1) div (c1(w1) + V)
 *   lm_q(doc)  = sum(p_q) div n_bigrams
 *
 * with `c2` the trained bigram count, `c1(w1) = Σ_w c2(w1,w)` (derived
 * from the model table, never stored separately — one less artifact to
 * drift), and `V` = distinct predicted-token vocabulary + 1 (the +1
 * standing in for the unseen type, and keeping `c1 + V ≥ 1` for unseen
 * left contexts). Monotone in the true smoothed likelihood per bigram,
 * pure int64 (`p_q ≤ 10^6`, so a doc needs > 9·10^12 bigrams to
 * overflow the sum), exact in both engines. A deployment wanting true
 * log-space perplexity computes `avg(-log(p))` off the same two joins —
 * a one-line change that the registry intentionally does not gate on.
 *
 * 100 TB shape: the model table is vocabulary-bounded (millions of rows
 * for a capped vocab — CCNet caps via its tokenizer), dwarfed by the
 * corpus; the corpus side is exploded to bigram rows ONCE and probed
 * with two equi-joins (bigram → c2, left token → c1) that Spark/AQE
 * broadcasts when the model fits and shuffle-hashes otherwise — nothing
 * corpus-scale shuffles except the per-doc re-aggregation on `doc_id`,
 * which map-side-combines (bigram rows of a doc are co-located with
 * their doc, partial sums shrink the shuffle to one row per doc).
 * Tier CUTOFFS are computed offline on a sample ([[likelihoodCutoffs]],
 * the CCNet protocol: tercile boundaries of the reference distribution)
 * and applied row-locally — never a global sort/ntile over the corpus.
 */
object LanguageModel {

  /** Same tokenizer as [[TextSearch]]/[[Dedup.shingles]]: whitespace
   *  split after trim. Tokens therefore never contain whitespace, which
   *  is what makes the single-string bigram key below collision-free. */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Bigram list of a token-array column (named `tsName`): `"w1 w2"`
   *  joined with a single space (collision-free: tokens contain no
   *  whitespace). Row-local. */
  private def bigrams(tsName: String): Column =
    expr(s"transform(sequence(1, size($tsName) - 1), " +
      s"i -> concat(element_at($tsName, i), ' ', element_at($tsName, i + 1)))")

  /** Bigram OCCURRENCE rows of a doc slice: `(doc_id, bg, w1)`, one row
   *  per position (no dedup — [[scoreDocs]] averages over occurrences).
   *  Docs with fewer than two tokens contribute nothing. */
  private[graft] def bigramRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(col("doc_id"), explode(bigrams("__ts")).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))

  /**
   * Model counts for one training chunk: `(bg, c2)` — the bigram string
   * and its occurrence count. Row-local per doc before the count, so
   * chunked builds compose: `foldCounts(bigramIncrement(a),
   * bigramIncrement(b)) == bigramIncrement(a union b)` exactly
   * (spec-asserted). Docs with fewer than two tokens contribute nothing.
   */
  def bigramIncrement(chunk: DataFrame, textCol: String): DataFrame = {
    val ts = toks(col(textCol))
    chunk.select(ts.as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(explode(bigrams("__ts")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
  }

  /** Fold two count increments into one model table (sum by bigram) —
   *  the per-epoch maintenance unit, same shape as the postings fold. */
  def foldCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bg").agg(sum("c2").as("c2"))

  /**
   * Score documents against a trained model: one row per doc with at
   * least one bigram — `(doc_id, n_bigrams, lm_q)`, `lm_q` the mean
   * quantized bigram likelihood in ppm (see object doc). Docs with
   * fewer than two tokens produce no row (nothing to predict — the
   * caller's length gate fires long before an LM gate would).
   *
   * `counts` is the `(bg, c2)` model table; `c1` and `V` are derived
   * from it here (two tiny aggregations of the model, not the corpus).
   */
  def scoreDocs(docs: DataFrame, counts: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    val c1 = counts
      .groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
      .agg(sum("c2").as("c1"))
    // V = distinct predicted tokens + 1 (unseen type); one tiny row
    val v = counts
      .select(element_at(split(col("bg"), " "), 2).as("w2")).distinct()
      .agg((count(lit(1)) + lit(1L)).as("v"))
    val dbg = bigramRows(docs, idCol, textCol)
    dbg.join(counts, Seq("bg"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        expr("1000000 * (coalesce(c2, 0) + 1) div (coalesce(c1, 0) + v)").as("p_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_q").as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("__s div n_bigrams").as("lm_q"))
  }

  /**
   * DSIR-style importance weighting (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score every
   * document under TWO bigram models — one trained on a high-quality
   * target slice, one on the raw corpus — and keep the difference as
   * the importance signal. In log space DSIR's weight is
   * `log p_target(doc) − log p_raw(doc)`; with this object's quantized
   * linear-likelihood scheme (see object doc: transcendentals are not
   * bit-portable across engines) the analogous exact-integer signal is
   *
   *   dsir_q(doc) = lm_q_target(doc) − lm_q_raw(doc)
   *
   * — the difference of the two mean quantized bigram likelihoods,
   * positive when the target model predicts the doc better than the
   * raw model. Selection composes downstream exactly like the CCNet
   * tiers: freeze a cutoff offline ([[likelihoodCutoffs]] on the
   * `dsir_q` column, or a top-fraction quantile) and gate row-locally;
   * proportional resampling composes with
   * [[Sampling.bernoulliByStratum]] over `dsir_q` buckets.
   *
   * Reference analog: `operation/HaarCascadeOp.java:99-117` — models
   * trained at prepare time, applied per tuple. 100 TB shape: the
   * corpus is tokenized and exploded to bigram rows ONCE (not once per
   * model — the single-pass form is the point of this operator vs
   * calling [[scoreDocs]] twice), probed with four equi-joins against
   * the two vocabulary-bounded model tables (AQE broadcasts them when
   * they fit), then re-aggregated per doc with map-side partial sums —
   * exactly one corpus-scale shuffle.
   *
   * Returns `(doc_id, n_bigrams, w_target, w_raw, dsir_q)`, one row per
   * doc with at least one bigram. `w_target`/`w_raw` are the two
   * [[scoreDocs]] `lm_q` values verbatim (spec-asserted), so existing
   * tier cutoffs stay meaningful on either column.
   */
  def importanceWeights(docs: DataFrame, target: DataFrame, raw: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def artifacts(m: DataFrame, p: String): (DataFrame, DataFrame, DataFrame) = (
      m.select(col("bg"), col("c2").as(s"c2_$p")),
      m.groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
        .agg(sum("c2").as(s"c1_$p")),
      m.select(element_at(split(col("bg"), " "), 2).as("w2")).distinct()
        .agg((count(lit(1)) + lit(1L)).as(s"v_$p")))
    val (t2, t1, tv) = artifacts(target, "t")
    val (r2, r1, rv) = artifacts(raw, "r")
    bigramRows(docs, idCol, textCol)
      .join(t2, Seq("bg"), "left").join(r2, Seq("bg"), "left")
      .join(t1, Seq("w1"), "left").join(r1, Seq("w1"), "left")
      .crossJoin(broadcast(tv)).crossJoin(broadcast(rv))
      .select(col("doc_id"),
        expr("1000000 * (coalesce(c2_t, 0) + 1) div (coalesce(c1_t, 0) + v_t)").as("p_t"),
        expr("1000000 * (coalesce(c2_r, 0) + 1) div (coalesce(c1_r, 0) + v_r)").as("p_r"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("p_t").as("__st"), sum("p_r").as("__sr"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("__st div n_bigrams").as("w_target"),
        expr("__sr div n_bigrams").as("w_raw"),
        expr("__st div n_bigrams - __sr div n_bigrams").as("dsir_q"))
  }

  /**
   * Serving-tier model artifacts, derived ONCE at service start (or per
   * maintenance epoch) and cached: the enriched model `(bg, c2, c1)` —
   * every bigram row carrying its left-context total so a single
   * equi-join yields both counts — and the left-context table `(w1, c1)`.
   * [[RequestResponse.lmScoreProbe]] probes these with the request batch
   * BROADCAST (inner joins), reconstructing the exact [[scoreDocs]] sum
   * arithmetically — a shuffled left join of a per-trigger request batch
   * against a model-scale table would shuffle the model every trigger.
   */
  def enrichModel(counts: DataFrame): DataFrame = {
    val c1 = c1Of(counts)
    counts.withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(c1, Seq("w1"))
      .select(col("bg"), col("c2"), col("c1"))
  }

  /** Left-context totals `(w1, c1)` of a model table. */
  def c1Of(counts: DataFrame): DataFrame =
    counts.groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
      .agg(sum("c2").as("c1"))

  /** The smoothing vocabulary scalar `V` (distinct predicted tokens + 1)
   *  as a driver-side long — frozen at service start / maintenance time. */
  def vocabPlusOne(counts: DataFrame): Long =
    counts.select(element_at(split(col("bg"), " "), 2)).distinct().count() + 1L

  /**
   * CCNet head/middle/tail tiers as a ROW-LOCAL case over precomputed
   * cutoffs: `lm_q >= headMin` → head, `>= midMin` → middle, else tail.
   * The cutoffs come from [[likelihoodCutoffs]] run offline on a sample
   * — applying quantile boundaries row-locally is what keeps the tier
   * assignment shuffle-free at corpus scale (a global ntile would be a
   * single-partition sort).
   */
  def tierByCutoffs(scored: DataFrame, headMin: Long, midMin: Long): DataFrame =
    scored.withColumn("tier",
      when(col("lm_q") >= headMin, lit("head"))
        .when(col("lm_q") >= midMin, lit("middle"))
        .otherwise(lit("tail")))

  /**
   * Tercile cutoffs of the score distribution via `approxQuantile` —
   * the offline half of the CCNet protocol (run on a sample or the
   * reference slice, then frozen into the ingest config). Returns
   * `(headMin, midMin)`. Serving-path helper: approximate by design,
   * so intentionally not oracle-gated.
   */
  def likelihoodCutoffs(scored: DataFrame, relErr: Double = 0.001): (Long, Long) = {
    val qs = scored.stat.approxQuantile("lm_q", Array(2.0 / 3, 1.0 / 3), relErr)
    (qs(0).toLong, qs(1).toLong)
  }
}
