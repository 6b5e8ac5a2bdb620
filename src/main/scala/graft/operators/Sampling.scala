package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic sampling for training-data pipelines: eval/held-out set
 * construction must be reproducible across reruns, engines, and cluster
 * sizes — so both primitives here derive their randomness from md5 of the
 * row id (built-in, codegen'd, and rebuilt digit-wise by the DuckDB
 * oracle), never from `rand()`.
 *
 * Reference analog: StormCV has no sampling plane (`ModGrouping` routes by
 * sequence-nr modulo, `util/RandomChannelSelector.java` load-balances);
 * these are the data-side sampling verbs a 100 TB corpus needs.
 *
 *  - [[bernoulli]]: keep a fixed fraction, independent per row — one
 *    stateless predicate, no shuffle, safe to push into the scan stage.
 *  - [[stratifiedTopN]]: exactly ≤ n rows per stratum, chosen by hash
 *    order — the deterministic "reservoir sample per key". Uses the
 *    bounded-heap [[TopK]] aggregator, so only ≤ n rows per (partition,
 *    stratum) cross the shuffle, not the corpus.
 */
object Sampling {

  /** 48-bit uniform hash of the id: first 12 hex digits of
    * `md5(utf8(id as string))` as a long — the same md5-truncation scheme
    * as [[Md5Hash]], expressed entirely in built-ins so it pipelines in
    * whole-stage codegen (`conv` parses the hex; 48 bits fit a long
    * exactly, which also keeps the oracle's digit expansion in exact
    * BIGINT arithmetic). */
  def hashUniform48(id: Column): Column =
    conv(substring(md5(id.cast(StringType).cast(BinaryType)), 1, 12), 16, 10)
      .cast(LongType)

  /** Deterministic Bernoulli sample: keeps rows with
    * `hash48(id) mod 1000 < keepPerMille` — a stable ~keepPerMille/1000
    * fraction, reproducible anywhere md5 exists. */
  def bernoulli(df: DataFrame, idCol: String, keepPerMille: Int): DataFrame = {
    require(keepPerMille >= 0 && keepPerMille <= 1000, "keepPerMille in [0,1000]")
    df.where(hashUniform48(col(idCol)) % 1000 < keepPerMille)
  }

  /**
   * Deterministic stratified sample: the ≤ `n` rows per `stratumCol`
   * value with the smallest `(hash48(id), id)` — every rerun and every
   * partitioning picks the same rows. Returns (stratum, id, rk) with
   * rk = 1..n in hash order.
   *
   * Contract (narrower than [[bernoulli]]): `idCol` must be a non-null
   * LONG — the bounded-heap [[TopK]] aggregator is typed on long ids (the
   * 100 TB-shape choice: an 8-byte id in the shuffle, not a string).
   * Hash a string key to a long id first if needed.
   */
  def stratifiedTopN(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame =
    TopK.perKey(
      df.select(col(stratumCol), col(idCol),
        (-hashUniform48(col(idCol))).as("neg_hu")), // TopK ranks score DESC ⇒ hash ASC
      stratumCol, idCol, "neg_hu", n, idCol, "neg_hu")
      .drop("neg_hu")

  /**
   * Deterministic train/validation/test split — eval-set construction as
   * a pure function of the row id: the id's salted 48-bit hash mod 1000
   * is bucketed against `[0, trainPm) / [trainPm, trainPm+valPm) /
   * rest`. Key by a CONTENT-stable id (e.g. the canonical URL,
   * [[UrlOps.canonicalUrl]]) and a re-crawled page can never migrate
   * across the train/eval boundary between corpus versions — the leakage
   * guarantee eval sets need. Returns the input plus `split ∈ {train,
   * val, test}`.
   *
   * The hash is SALTED (`md5(id || '#' || salt)`) so the split is
   * independent of [[bernoulli]] / [[shardAssign]] / [[stratifiedTopN]],
   * which all consume the unsalted id hash — without the salt, a
   * `bernoulli(p)` sample of the corpus would land entirely inside
   * `train` for any `trainPm ≥ p` (both predicates read the same
   * `hu mod 1000`). Distinct salts give independent splits; the same
   * salt is reproducible anywhere md5 exists.
   *
   * Growing `trainPm` only MOVES rows val/test → train (buckets are
   * fixed; only thresholds shift), so the eval sets of a stricter split
   * nest inside a looser one — re-planning the ratio never leaks train
   * docs into eval. Stateless predicate: pipelines into the scan stage,
   * no shuffle.
   */
  def trainValTestSplit(df: DataFrame, idCol: String,
      trainPm: Int, valPm: Int, salt: String = "split"): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000,
      s"per-mille bounds: trainPm=$trainPm valPm=$valPm must sum <= 1000")
    val bucket = hashUniform48(
      concat(col(idCol).cast(StringType), lit("#" + salt))) % 1000
    df.withColumn("split",
      when(bucket < trainPm, "train")
        .when(bucket < trainPm + valPm, "val")
        .otherwise("test"))
  }

  /**
   * Deterministic training-shard export: assigns every row a shard in
   * `[0, nShards)` and a dense position within its shard, both pure
   * functions of the row id — the reproducible global shuffle a training
   * run needs (shard boundaries AND within-shard order identical on every
   * rerun, engine, partitioning, and input arrival order, so a data
   * loader can resume mid-epoch by (shard, pos)). Returns the input
   * columns plus `(shard, pos)` with pos = 1-based rank of
   * `(hash48(id), id)` within the shard.
   *
   * Physical shape IS the export plan: the window is one hash exchange on
   * `shard` (`nShards` write groups) + an in-partition sort — exactly
   * what `df.repartition($"shard").sortWithinPartitions(...)` before a
   * per-shard writer would do, no global sort, no driver involvement.
   * Shards are hash-balanced (±√ noise), so no writer is a straggler.
   */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("hu"), col(idCol))
    df.withColumn("hu", hashUniform48(col(idCol)))
      .withColumn("shard", col("hu") % nShards)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("hu")
  }

  /**
   * Per-stratum-rate Bernoulli sample — the language/domain REBALANCING
   * verb (a web corpus is resampled per language/domain to a target mix;
   * the rate is a property of the stratum, not the corpus). `rates` is a
   * tiny `(stratum, keep_per_mille)` dim broadcast against the corpus;
   * membership stays the stateless [[hashUniform48]] predicate, so the
   * plan is scan → broadcast-hash-join → filter — the corpus is never
   * shuffled, and the kept SET for a given ratebook is identical on
   * every rerun, engine, and partitioning (downsampling a stratum later
   * keeps a subset of the earlier sample: `hu mod 1000 < p` nests by p).
   * A stratum absent from `rates` keeps nothing (inner join — explicit
   * allowlist semantics; pass rate 1000 to keep a stratum whole).
   *
   * The ratebook is POSITIONAL: column 1 is the stratum key, column 2
   * the keep-per-mille rate (validated: exactly 2 columns, rate column
   * numeric — a swapped ratebook fails fast instead of sampling by
   * stratum-as-rate). Join-side names are mangled internally so a corpus
   * column can never collide with or be dropped by the ratebook's.
   */
  def bernoulliByStratum(df: DataFrame, idCol: String, stratumCol: String,
      rates: DataFrame): DataFrame = {
    require(rates.columns.length == 2,
      s"ratebook must be exactly (stratum, keep_per_mille); got ${rates.columns.toSeq}")
    require(rates.schema(1).dataType.isInstanceOf[NumericType],
      s"ratebook column 2 (keep_per_mille) must be numeric; got " +
        s"${rates.schema(1).dataType.simpleString} — swapped column order?")
    val Array(c0, c1) = rates.columns
    val sc = "__graft_stratum"; val kc = "__graft_kpm"
    require(!df.columns.contains(sc) && !df.columns.contains(kc),
      s"corpus must not carry reserved columns $sc/$kc")
    val r = rates.select(col(c0).as(sc), col(c1).cast(LongType).as(kc))
    df.join(broadcast(r), df(stratumCol) === col(sc))
      .where(hashUniform48(col(idCol)) % 1000 < col(kc))
      .drop(sc, kc)
  }

  /**
   * Token-budget sequence packing ("concat then chunk") — the step that
   * turns a deduped, sampled corpus into fixed-budget training sequences:
   * documents are laid out in [[shardAssign]]'s deterministic (shard,
   * pos) order and cut into consecutive `budget`-token packs. Returns the
   * input plus `(shard, pos, pack, pack_off)` where `pack_off` is the
   * token offset of the document inside its pack; a document may straddle
   * a pack boundary (GPT-style packing keeps the tail in the next pack
   * rather than padding).
   *
   * Everything is a pure function of (id, tokens): `pack = floor(tokens
   * before this doc in its shard / budget)`. Physical shape: ONE hash
   * exchange on `shard` + an in-partition sort feeding both the rank and
   * the running sum — no global sort, no driver state; loaders resume
   * mid-epoch by (shard, pack).
   */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    shardAssign(df, idCol, nShards)
      .withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w).cast(LongType), lit(0L)))
      .withColumn("pack", expr(s"cum_before div $budget"))
      .withColumn("pack_off", col("cum_before") % budget)
      .drop("cum_before")
  }

  /**
   * Derive the [[bernoulliByStratum]] ratebook that hits a TARGET mix —
   * the mixture-planning step upstream of rebalancing: given the corpus's
   * actual per-stratum doc counts and a target share per stratum
   * (per-mille of the output), compute the largest downsample-only output
   * respecting the mix, and each stratum's keep rate for it. Closes the
   * loop with [[bernoulliByStratum]]: plan the mix here, sample there.
   *
   * All arithmetic is INTEGER (exact on every engine): the output size is
   * capped by the scarcest stratum, `n_out = min_s floor(1000·n_s/t_s)`
   * (the largest total for which stratum s can still supply its share
   * without upsampling), then `keep_s = floor(n_out·t_s/1000)` docs and
   * `rate_pm_s = floor(1000·keep_s/n_s)`. A stratum absent from `targets`
   * contributes nothing and gets no row (inner join — same allowlist
   * semantics as [[bernoulliByStratum]]). `targets` is positional
   * `(stratum, target_pm)` with the same validation; shares need not sum
   * to 1000 (they are relative weights).
   *
   * Physical shape: one partial-agg count per stratum, a broadcast join
   * of the (tiny) targets, one single-row scalar min broadcast back —
   * the corpus is scanned once and never shuffled. `rate_pm` is the
   * per-mille contract [[bernoulliByStratum]] consumes; realized counts
   * differ from `keep_docs` by hash-Bernoulli ±√n noise PLUS the
   * per-mille floor of `rate_pm` (a deterministic undershoot of up to
   * n_s/1000 — see the weight note below).
   *
   * `weightCol`: mixes are usually specified over TOKENS, not documents
   * — pass a per-row weight column (e.g. a token count) and the whole
   * plan runs on summed weights instead of doc counts (`n_docs` then
   * holds the stratum's total weight and `keep_docs` the weight to
   * keep); Bernoulli keep probability is still per DOCUMENT, so the
   * realized token mix matches the target in expectation (exactly what
   * uniform-rate token sampling can promise without splitting docs).
   * Realized counts also carry the per-mille QUANTIZATION of `rate_pm`
   * (a deterministic undershoot of up to n_s/1000 on top of the ±√n
   * Bernoulli noise — budget tolerance off rate granularity, not √n,
   * for strata above ~10⁶ rows).
   *
   * A targeted stratum ABSENT from the corpus follows the formula, not
   * the join: its n_s = 0 forces `n_out = 0` and the whole ratebook
   * goes to zero rates (the mix is unreachable without it) — loudly
   * visible, never a silently-wrong mix. A non-positive `target_pm`
   * fails the query (`raise_error`) rather than div-by-zero to NULL.
   */
  def ratebookForTargetMix(df: DataFrame, stratumCol: String,
      targets: DataFrame, weightCol: Option[String] = None): DataFrame = {
    require(targets.columns.length == 2,
      s"targets must be exactly (stratum, target_pm); got ${targets.columns.toSeq}")
    require(targets.schema(1).dataType.isInstanceOf[NumericType],
      s"targets column 2 (target_pm) must be numeric; got " +
        s"${targets.schema(1).dataType.simpleString} — swapped column order?")
    val Array(c0, c1) = targets.columns
    val t = targets.select(col(c0).as(stratumCol),
      when(col(c1).cast(LongType) <= 0,
        raise_error(concat(lit(s"ratebookForTargetMix: target_pm must be " +
          s"positive; stratum "), col(c0).cast(StringType),
          lit(" has "), col(c1).cast(StringType))))
        .otherwise(col(c1).cast(LongType)).as("target_pm"))
    val mass = weightCol.map(w => sum(col(w).cast(LongType)))
      .getOrElse(count(lit(1)))
    // zero-fill then inner-broadcast-join: a targeted stratum missing
    // from the corpus must keep a row with n_docs = 0, but an OUTER join
    // preserving the tiny side cannot broadcast it (the build side must
    // be the non-preserved one — Spark would broadcast the corpus-strata
    // aggregate instead); unioning one 0-mass row per target before the
    // re-aggregate keeps the join inner and the broadcast on the dim
    val zeros = t.select(col(stratumCol), lit(0L).as("n_docs"))
    val counts = df.groupBy(col(stratumCol)).agg(mass.as("n_docs"))
      .unionByName(zeros)
      .groupBy(col(stratumCol)).agg(sum(col("n_docs")).as("n_docs"))
      .join(broadcast(t), Seq(stratumCol))
      .withColumn("cap", expr("(1000 * n_docs) div target_pm"))
    val nOut = counts.agg(min(col("cap")).as("n_out"))
    counts.crossJoin(broadcast(nOut))
      .withColumn("keep_docs", expr("(n_out * target_pm) div 1000"))
      .withColumn("rate_pm", when(col("n_docs") === 0, lit(0L))
        .otherwise(expr("(1000 * keep_docs) div n_docs")))
      .select(col(stratumCol), col("n_docs"), col("target_pm"),
        col("keep_docs"), col("rate_pm"))
  }

  /**
   * Quality-ranked per-stratum TOKEN-budget curation — the mixture-
   * building verb behind "keep the best documents per language until its
   * token quota is met": within each stratum, documents are ordered
   * `(score DESC, hash48(id), id)` and a document is kept iff the token
   * mass STRICTLY BEFORE it in that order is `< budget`. The straddling
   * document is therefore INCLUDED (quotas are met-then-trimmed at pack
   * level, never silently under-filled), the kept set for a given budget
   * NESTS inside any larger budget's, `budget <= 0` keeps nothing, and a
   * stratum absent from `budgets` keeps nothing (inner join — the same
   * explicit-allowlist semantics as [[bernoulliByStratum]]).
   *
   * `budgets` is POSITIONAL `(stratum, token_budget)`, validated like
   * [[ratebookForTargetMix]]'s targets. Rows with a null score or null
   * token count are dropped up front (engines disagree on null ordering;
   * a curation pass has no meaningful rank for them).
   *
   * 100 TB shape — the naive form (one window over the whole corpus per
   * stratum) sorts EVERY document through one partition per stratum, the
   * classic skew killer. This runs in two phases instead:
   *   1. per-`(stratum, score)` token masses (one partial-agg exchange;
   *      `score` is a low-cardinality quality grade, so this table is
   *      strata × grades rows) + a window over THAT to find each group's
   *      cumulative-before mass → verdicts: groups wholly under budget
   *      are kept outright, groups starting at/after budget are dropped,
   *      and at most ONE boundary group per stratum remains;
   *   2. verdicts broadcast back onto the scan; only the boundary
   *      group's documents (one score grade of one stratum) pay a
   *      doc-level rank, partitioned `(stratum, score)` so different
   *      strata's boundaries land on different tasks.
   * The kept SET is provably identical to the naive rule (a doc in a
   * wholly-kept group has cum-before ≤ group-end − own-tokens < budget;
   * a doc in a dropped group has cum-before ≥ group-start ≥ budget), and
   * the DuckDB oracle replays the NAIVE window form — the equivalence is
   * value-checked, not asserted.
   */
  def tokenBudgetByStratum(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: String, tokensCol: String, budgets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.columns.length == 2,
      s"budgets must be exactly (stratum, token_budget); got ${budgets.columns.toSeq}")
    require(budgets.schema(1).dataType.isInstanceOf[NumericType],
      s"budgets column 2 (token_budget) must be numeric; got " +
        s"${budgets.schema(1).dataType.simpleString} — swapped column order?")
    val reserved = Seq("__graft_stratum", "__graft_budget", "__gt", "__cb",
      "__boundary", "__hu", "__ic")
    require(!df.columns.exists(reserved.contains),
      s"corpus must not carry reserved columns ${reserved.mkString("/")}")
    val Array(c0, c1) = budgets.columns
    val b = budgets.select(col(c0).as("__graft_stratum"),
      col(c1).cast(LongType).as("__graft_budget"))
    val d = df.where(col(scoreCol).isNotNull && col(tokensCol).isNotNull)

    // phase 1: group masses + verdicts (strata × score-grades rows)
    val gw = Window.partitionBy(col(stratumCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val verdicts = d.groupBy(col(stratumCol), col(scoreCol))
      .agg(sum(col(tokensCol).cast(LongType)).as("__gt"))
      .withColumn("__cb", sum(col("__gt")).over(gw) - col("__gt"))
      .join(broadcast(b), col(stratumCol) === col("__graft_stratum"))
      .where(col("__cb") < col("__graft_budget")) // drops at/after-budget groups
      .withColumn("__boundary",
        col("__cb") + col("__gt") > col("__graft_budget"))
      .select(col(stratumCol), col(scoreCol), col("__cb"),
        col("__graft_budget"), col("__boundary"))

    // phase 2: verdicts broadcast onto the scan; only the boundary group
    // (≤ one score grade per stratum) pays a doc-level rank
    val kept = d.join(broadcast(verdicts), Seq(stratumCol, scoreCol))
    val outCols = df.columns.map(col).toSeq
    val full = kept.where(!col("__boundary")).select(outCols: _*)
    val bw = Window.partitionBy(col(stratumCol), col(scoreCol))
      .orderBy(col("__hu"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = kept.where(col("__boundary"))
      .withColumn("__hu", hashUniform48(col(idCol)))
      .withColumn("__ic",
        sum(col(tokensCol).cast(LongType)).over(bw) - col(tokensCol).cast(LongType))
      .where(col("__cb") + col("__ic") < col("__graft_budget"))
      .select(outCols: _*)
    full.unionByName(boundary)
  }
}
