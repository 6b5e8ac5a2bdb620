package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for web-scale corpora — the training-data-
 * pipeline layer on top of the page engine.
 *
 * Scale notes (the part that matters at 10^12 rows):
 *  - exact dedup is one hash-shuffle on a 16-byte digest (never on the
 *    full text — map-side the text reduces to md5 before the exchange);
 *  - MinHash-LSH shuffles only (band, signature) pairs — `bands` rows per
 *    doc — then equi-joins buckets; candidate verification re-joins the
 *    shingle sets only for candidate pairs (a tiny fraction);
 *  - SimHash reduces each doc to one long; near-dup check is a self-join
 *    on bucket prefixes + popcount filter;
 *  - pair outputs are always keyed `id_a < id_b` so results are set-stable.
 *
 * All similarity scores are quantized to integers (see [[VectorOps]]) so
 * outputs are bit-identical across engines and cluster sizes.
 */
object Dedup {

  /**
   * Exact duplicate groups by content digest.
   * Returns (text_hash, keeper = min id, dup_cnt).
   */
  def exactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol).cast(BinaryType)).as("text_hash"), col(idCol))
      .groupBy($"text_hash".asInstanceOf[Column])
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("dup_cnt"))

  /**
   * Per-group duplication rate — the GROUP-level dedup signal behind
   * domain/source blocklists (RefinedWeb-style: a host whose pages are
   * mostly copies of each other is a mirror, a template farm, or scraped
   * boilerplate — drop the HOST, don't pay per-page dedup for it).
   * Groups by `groupCol`, counts docs and distinct normalized-content
   * fingerprints ([[TextAnalysis.fingerprint]] — layout-invariant, so
   * trivial re-renderings count as dups), and returns
   * `(group, n_docs, n_distinct, dup_q, blocked)` with
   * `dup_q = floor(1000·(n_docs − n_distinct)/n_docs)` (integer) and
   * `blocked = dup_q ≥ maxDupQ`.
   *
   * 100 TB shape: one partial-aggregated groupBy on the group key
   * (count-distinct rewrites to two-level agg on (group, fp) — both
   * exchanges are on bounded-width keys and the second input is already
   * ~distinct-fp sized); the verdict feeds a broadcast anti-join at
   * ingest, so blocked groups die in the scan stage of every later pass.
   */
  def dupRateByGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, maxDupQ: Int): DataFrame = {
    require(maxDupQ >= 0 && maxDupQ <= 1000, "maxDupQ in [0,1000]")
    df.select(col(groupCol),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__fp")).as("n_distinct"))
      .withColumn("dup_q", floor(lit(1000) * (col("n_docs") - col("n_distinct"))
        / col("n_docs")).cast(LongType))
      .withColumn("blocked", col("dup_q") >= maxDupQ)
  }

  /**
   * Incremental maintenance for the group-level dup-rate — the
   * [[spanStatsIncrement]] shape at (group, fingerprint) granularity:
   * history is the persisted `(group, fp, n)` table (one row per
   * distinct fingerprint per group — ~distinct-content-sized, never the
   * corpus) and raw text is never re-fingerprinted; an increment
   * fingerprints ONLY the fresh docs and merges counts (union + one
   * sum-groupBy, both sides already hash-partitioned). Returns
   * (updatedGroupFp to persist, refreshed verdicts ≡ [[dupRateByGroup]]
   * over history+fresh — chunked arrival ≡ one batch pass,
   * spec-asserted).
   *
   * PRECONDITION: `fresh` must be DISJOINT from the docs already folded
   * into `historyGroupFp` (exactly-once epochs — the sink manifest's
   * re-delivered-epoch detection gives streaming callers this for
   * free); a re-delivered doc permanently inflates its group's counts.
   */
  def dupRateIncrement(historyGroupFp: DataFrame, fresh: DataFrame,
      textCol: String, groupCol: String,
      maxDupQ: Int): (DataFrame, DataFrame) = {
    require(maxDupQ >= 0 && maxDupQ <= 1000, "maxDupQ in [0,1000]")
    val freshFp = fresh
      .select(col(groupCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col(groupCol), col("fp")).agg(count(lit(1)).as("n"))
    val updated = historyGroupFp.unionByName(freshFp)
      .groupBy(col(groupCol), col("fp")).agg(sum(col("n")).as("n"))
    // n_distinct counts NON-NULL fingerprints only — countDistinct in
    // [[dupRateByGroup]] skips NULLs (null-text docs), so the incremental
    // verdicts must too or a null-fp row would add a phantom distinct
    val rates = updated.groupBy(col(groupCol))
      .agg(sum(col("n")).as("n_docs"),
        count(when(col("fp").isNotNull, lit(1))).as("n_distinct"))
      .withColumn("dup_q", floor(lit(1000) * (col("n_docs") - col("n_distinct"))
        / col("n_docs")).cast(LongType))
      .withColumn("blocked", col("dup_q") >= maxDupQ)
    (updated, rates)
  }

  /**
   * Cross-group mirror detection — the complement of [[dupRateByGroup]]:
   * that one flags a group whose pages duplicate EACH OTHER; this one
   * finds PAIRS of groups (hosts, sources) serving the same content —
   * mirrors, aggregators, re-hosted archives — the site-level dedup a
   * crawl pipeline runs before paying per-page dedup on both copies.
   * Returns `(g1, g2, shared, n1, n2, share_pm)`: distinct normalized
   * content fingerprints shared, each side's distinct-fp count, and
   * `share_pm = floor(1000·shared / least(n1, n2))` — CONTAINMENT of the
   * smaller side (a partial mirror of a large site still scores 1000),
   * kept at `share_pm >= minSharePm`.
   *
   * 100 TB shape: groups pair only through SHARED fingerprints — one
   * `(group, fp)` distinct exchange, then a self-equi-join ON `fp` (the
   * exchange is reused; never an all-pairs of groups). The one
   * quadratic hazard is boilerplate: a fingerprint hosted by F groups
   * yields F²/2 pair rows, so fingerprints on more than `maxFanout`
   * groups are dropped first — standard practice (site chrome shared by
   * thousands of hosts carries no mirror signal; a real mirror shares
   * its CONTENT, which few hosts carry). The per-group size table is
   * group-cardinality (10⁸ hosts at web scale) and is therefore joined,
   * never broadcast. NULL-text docs fingerprint to NULL and are
   * excluded (they assert nothing about mirroring).
   */
  def mirrorHostPairs(df: DataFrame, groupCol: String, textCol: String,
      maxFanout: Int, minSharePm: Int): DataFrame =
    mirrorPairsFromIndex(
      df.select(col(groupCol).as("g"),
          TextAnalysis.fingerprint(col(textCol)).as("fp"))
        .where(col("fp").isNotNull)
        .distinct(),
      maxFanout, minSharePm)

  /**
   * Incremental maintenance of the mirror index — the persisted
   * `(g, fp)` DISTINCT table behind [[mirrorHostPairs]]: an epoch folds
   * in by fingerprinting ONLY the fresh docs, union, and one distinct
   * re-aggregation (both sides already hash-partitioned the same way).
   * Because the table is a SET, the fold is an idempotent monoid — a
   * re-delivered epoch is absorbed with NO exactly-once guard, like
   * [[BloomSet.bloomIncrement]] and unlike every count-shaped increment
   * ([[spanStatsIncrement]] / [[dupRateIncrement]]); chunked arrival in
   * ANY order ≡ one batch build (spec-asserted). Serve pairs off the
   * table with [[mirrorPairsFromIndex]] — raw text is never
   * re-fingerprinted to answer a mirror question.
   */
  def mirrorIncrement(historyHfp: DataFrame, fresh: DataFrame,
      groupCol: String, textCol: String): DataFrame = {
    require(historyHfp.columns.toSeq == Seq("g", "fp"),
      s"history must be (g, fp); got ${historyHfp.columns.mkString(",")}")
    historyHfp.unionByName(
      fresh.select(col(groupCol).as("g"),
          TextAnalysis.fingerprint(col(textCol)).as("fp"))
        .where(col("fp").isNotNull))
      .distinct()
  }

  /** [[mirrorHostPairs]] served off a persisted `(g, fp)` index table
    * ([[mirrorIncrement]] output) — the same pairing plan minus the
    * fingerprint scan. */
  def mirrorPairsFromIndex(hfp: DataFrame, maxFanout: Int,
      minSharePm: Int): DataFrame = {
    require(maxFanout >= 2, s"maxFanout must be >= 2 (got $maxFanout); " +
      "1 would drop every shareable fingerprint")
    require(minSharePm >= 1 && minSharePm <= 1000,
      s"minSharePm in [1,1000]; got $minSharePm")
    // every join side here scales with the corpus (fp tables are
    // distinct-content-cardinality, the size table host-cardinality) —
    // pin sort-merge like the rareTokenStats lexicon join so a
    // small-sample size estimate can never "optimize" one into a
    // broadcast that OOMs at corpus scale
    val sizes = hfp.groupBy($"g").agg(count(lit(1)).as("n"))
    val rare = hfp.groupBy($"fp").agg(count(lit(1)).as("gf"))
      .where($"gf" <= maxFanout).select($"fp")
    val kept = hfp.join(rare.hint("merge"), Seq("fp"))
    val pairs = kept.select($"fp", $"g".as("g1"))
      .join(kept.select($"fp", $"g".as("g2")).hint("merge"),
        Seq("fp")).where($"g1" < $"g2")
      .groupBy($"g1", $"g2").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select($"g".as("g1"), $"n".as("n1")).hint("merge"), Seq("g1"))
      .join(sizes.select($"g".as("g2"), $"n".as("n2")).hint("merge"), Seq("g2"))
      .withColumn("share_pm",
        floor(lit(1000) * $"shared" / least($"n1", $"n2")).cast(LongType))
      .where($"share_pm" >= minSharePm)
      .select($"g1", $"g2", $"shared", $"n1", $"n2", $"share_pm")
  }

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Word n-gram shingle set, one row per distinct (id, shingle) for
    * id-unique inputs. Dedup is ROW-LOCAL (`array_distinct` before the
    * explode — no exchange): every consumer either feeds an id-keyed
    * table (one row per doc, so per-row distinct IS per-(id, shingle)
    * distinct) or collapses cross-row duplicates in its own downstream
    * aggregation ([[splitLeakage]]'s flag-max). The previous global
    * `.distinct()` bought nothing those aggregations don't already do
    * map-side, and cost every caller a full exchange. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(word_shingles(col(textCol), n)).as("shingle"))

  /** `word_shingles(text, n): array<string>` Column over [[WordShingles]]. */
  def word_shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      WordShingles(org.apache.spark.sql.graftshim.Bridge.expression(text), n))

  /** The interpreted-HOF twin of [[shingles]] — the semantic reference
    * the spec pins [[WordShingles]] against (value-identical; the HOF
    * lambda runs interpreted per window). */
  private[graft] def shinglesHof(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // build the shingle ARRAY per doc, then explode it: an index-explode
    // would carry the full token array on every exploded row
    // (O(tokens²) bytes moved per doc — measured 40% of q21's wall); the
    // transform runs once per doc over tokens elements (linear), and
    // sequence(0, -1) would step backwards — guard short docs to empty
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col(idCol), explode(when(size($"toks") >= n,
          array_distinct(transform(sequence(lit(0), size($"toks") - n),
            i => concat_ws(" ", (0 until n).map(k => element_at($"toks", i + k + 1)): _*))))
        .otherwise(array().cast("array<string>"))).as("shingle"))
  }

  /**
   * Shingles with a document-frequency cap: shingles present in more than
   * `maxDf` documents are dropped (`maxDf <= 0` disables the cap).
   *
   * This is the feature that makes shingle self-joins survive real web
   * data: one stopword shingle shared by 10^6 docs would contribute 10^12
   * join rows. Capped shingles bound the per-key fan-out of every
   * downstream equi-join to `maxDf²` — cost control, with the standard
   * recall argument that ubiquitous shingles carry no near-dup signal.
   * Jaccard is then defined over the capped shingle universe (both set
   * sizes and intersections), so results stay internally consistent and
   * oracle-reproducible.
   */
  def cappedShingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      maxDf: Int): DataFrame = {
    if (maxDf <= 0) shingles(df, idCol, textCol, n)
    else {
      // ONE shingle-keyed exchange serves the whole family: the df-count
      // groupBy, the anti-join, and every downstream shingle-keyed
      // consumer (the Jaccard self-join, the LSH verification probes)
      // are all co-partitioned on it — AQE reuses the single shuffle
      // stage across consumers instead of each planting its own
      // exchange (guide §2.4). The hot set stays tiny (only shingles
      // with df > cap), so the anti-join's build side broadcasts.
      val sh = shingles(df, idCol, textCol, n).repartition($"shingle")
      val hot = sh.groupBy($"shingle").agg(count(lit(1)).as("df_cnt"))
        .where($"df_cnt" > maxDf).select($"shingle")
      sh.join(hot, Seq("shingle"), "left_anti")
    }
  }

  /** Quantized Jaccard from a per-pair intersection count + per-doc sizes. */
  private def jaccardFromInter(inter: DataFrame, sizes: DataFrame, idCol: String,
      minJaccQ: Int): DataFrame =
    inter
      .join(sizes.select(col(idCol).as("id_a"), $"sz".as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), $"sz".as("sz_b")), "id_b")
      .select($"id_a", $"id_b",
        floor(lit(1000) * $"inter" / ($"sz_a" + $"sz_b" - $"inter")).cast(LongType).as("jacc_q"))
      .where($"jacc_q" >= minJaccQ)

  /**
   * N-gram Jaccard near-duplicate pairs with quantized similarity
   * `jacc_q = floor(1000 * |A∩B| / |A∪B|) ≥ minJaccQ`.
   *
   * Plan shape: shingle-explode → self-equi-join on shingle (hash shuffle
   * on the shingle, NOT on the pair) → count intersections per pair →
   * join per-doc set sizes. The equi-join on shingle keys is what keeps
   * this from being a cross join at scale; `maxDf` caps per-shingle
   * fan-out (see [[cappedShingles]]) so a single hot shingle cannot turn
   * the self-join quadratic.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccQ: Int = 500, maxDf: Int = 0): DataFrame = {
    // no .cache() here: a library operator must not pin executor memory
    // behind the caller's back; the shuffle files of the shingle exchange
    // are reused by Spark for the two consumers (sizes + inter) —
    // verified on the q21 plan: with exchange reuse the corpus parquet is
    // scanned 3x total and the shingle exchange feeds 5 consumers via
    // ReusedExchange (AQE reuses the same stages at runtime; its plan
    // STRING shows the pre-reuse tree, so don't audit reuse by grepping it)
    val sh = cappedShingles(df, idCol, textCol, n, maxDf)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), $"shingle")
    val b = sh.select(col(idCol).as("id_b"), $"shingle")
    val inter = a.join(b, Seq("shingle"))
      .where($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, sizes, idCol, minJaccQ)
  }

  /**
   * MinHash signature rows: `bands` independent min-hashes per doc, each
   * the lexicographic min of `md5(shingle || '|' || band)` over the
   * doc's shingle set (string-min is engine-portable; a band's equal
   * signature ⇒ candidate bucket). One (id, band, sig) row per band.
   */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8): DataFrame =
    minhashBandsFromShingles(shingles(df, idCol, textCol, n), idCol, bands)

  /** [[minhashBands]] over an existing (id, shingle) set.
    *
    * The `bands` signatures are aggregated as `bands` parallel `min`
    * columns of ONE groupBy(id) — not an explode×bands before the agg:
    * min over hex strings plans as SortAggregate (string agg buffers
    * are not hash-aggregable), so the explode form sorted `bands`× the
    * rows for the same result. The md5 inputs are byte-identical
    * (`shingle || "|" || band` with the band a compile-time literal)
    * and the post-agg posexplode recovers the same (id, band, sig)
    * rows — band = position 0..bands-1, exactly the old
    * `sequence(0, bands-1)` values. */
  def minhashBandsFromShingles(sh: DataFrame, idCol: String, bands: Int): DataFrame = {
    val sigCols = (0 until bands).map(b =>
      md5(concat($"shingle", lit("|" + b)).cast(BinaryType)).as(s"__s$b"))
    val minCols = (0 until bands).map(b => min(col(s"__s$b")).as(s"__m$b"))
    sh.select(col(idCol) +: sigCols: _*)
      .groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol),
        posexplode(array((0 until bands).map(b => col(s"__m$b")): _*)))
      .select(col(idCol), $"pos".cast("int").as("band"), $"col".as("sig"))
  }

  // NOTE (measured, sf0.1): formulating shingles/min-hashes as per-row
  // nested higher-order functions (transform→array_min→md5) is 10–20×
  // slower than the explode+partial-agg form below — nested lambda HOFs
  // run INTERPRETED (no whole-stage codegen), while exploded md5/min go
  // through codegen'd projections and map-side partial aggregation. Keep
  // the exploded shape.

  /**
   * MinHash-LSH candidate pairs: docs sharing ≥1 (band, sig) bucket,
   * verified with the exact quantized Jaccard. The classic
   * shingle→minhash→band→bucket-join pipeline; only bucket-mates are ever
   * compared, so cost is driven by bucket collision rate, not |docs|².
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8, minJaccQ: Int = 500, maxDf: Int = 0): DataFrame = {
    val sh = cappedShingles(df, idCol, textCol, n, maxDf)
    val mh = minhashBandsFromShingles(sh, idCol, bands)
    val l = mh.select($"band", $"sig", col(idCol).as("id_a"))
    val r = mh.select($"band", $"sig", col(idCol).as("id_b"))
    val cands = l.join(r, Seq("band", "sig"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
    // verification is constrained to the candidate PAIRS (not all-pairs
    // among candidate-involved docs): route the shingle-intersection join
    // through cands, so each candidate doc is only compared against its
    // bucket-mates — |cands| · avg-set-size work, independent of how many
    // other candidates exist
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(sh.select(col(idCol).as("id_a"), $"shingle"), "id_a")
      .join(sh.select(col(idCol).as("id_b"), $"shingle"), Seq("id_b", "shingle"))
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, sizes, idCol, minJaccQ)
  }

  /**
   * SimHash near-duplicate pairs: hamming(simhash_a, simhash_b) ≤ maxDist,
   * by the block-permuted table scheme (Manku et al., WWW'07 §3): the 64
   * signature bits split into `nBlocks` equal blocks; a pair within
   * hamming `k` differs in at most k blocks, so it agrees exactly on at
   * least one of the C(nBlocks, nBlocks−k) block subsets. One table per
   * subset, keyed on that subset's concatenated bits — a bucket equi-join,
   * never a cross join.
   *
   * `nBlocks` is the scale knob: key width = 64·(1 − k/nBlocks) bits.
   *   nBlocks=4, k=3 → 4 tables × 16-bit keys (fine to ~10^7 docs);
   *   nBlocks=8, k=3 → 56 tables × 40-bit keys (10^9+ docs: expected
   *   bucket occupancy |docs|/2^40, at the price of 56 probe rows/doc).
   * Use [[simhashBlocksForCorpus]] to derive it from the corpus size.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, nBlocks: Int = 4): DataFrame = {
    require(nBlocks > maxDist && nBlocks <= 64 && 64 % nBlocks == 0,
      s"need 64 % nBlocks == 0 and nBlocks > maxDist; got nBlocks=$nBlocks maxDist=$maxDist")
    val w = 64 / nBlocks
    val mask = if (w == 64) -1L else (1L << w) - 1
    val subsets = (0 until nBlocks).combinations(nBlocks - maxDist).toSeq
    val withSig = df.select(col(idCol), TextAnalysis.simhash64(col(textCol)).as("sig"))
    val keyExprs = subsets.zipWithIndex.map { case (blks, t) =>
      val key = blks.zipWithIndex
        .map { case (b, j) =>
          shiftleft(shiftrightunsigned($"sig", b * w).bitwiseAND(lit(mask)), j * w) }
        .reduce(_ bitwiseOR _)
      struct(lit(t).as("tbl"), key.as("key"))
    }
    val blocks = withSig
      .select(col(idCol), $"sig", explode(array(keyExprs: _*)).as("bk"))
      .select(col(idCol), $"sig", $"bk.tbl".as("tbl"), $"bk.key".as("key"))
    val l = blocks.select($"tbl", $"key", col(idCol).as("id_a"), $"sig".as("sig_a"))
    val r = blocks.select($"tbl", $"key", col(idCol).as("id_b"), $"sig".as("sig_b"))
    l.join(r, Seq("tbl", "key"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        TextAnalysis.hamming64($"sig_a", $"sig_b").as("dist"))
      .distinct()
      .where($"dist" <= maxDist)
  }

  /**
   * Smallest valid `nBlocks` whose bucket-key width keeps the expected
   * bucket occupancy ≤ `targetPerBucket` for an `nDocs`-row corpus:
   * occupancy ≈ nDocs / 2^keyWidth with keyWidth = 64·(1 − k/nBlocks).
   * Returns a divisor of 64; caps at 16 blocks (beyond that the table
   * count C(nBlocks, k) dominates the cost instead).
   */
  def simhashBlocksForCorpus(nDocs: Long, maxDist: Int = 3,
      targetPerBucket: Long = 1024L): Int = {
    val needBits = math.ceil(math.log(math.max(1.0, nDocs.toDouble / targetPerBucket)) /
      math.log(2.0)).toInt
    Seq(2, 4, 8, 16).filter(_ > maxDist)
      .find(b => 64 * (b - maxDist) / b >= needBits)
      .getOrElse(16)
  }

  /**
   * Hyperplane count for [[embeddingNearDupPairs]]/ANN bucketing sized to
   * the corpus: 2^nPlanes buckets with expected occupancy ≤
   * `targetPerBucket` (in-bucket verification is quadratic, so occupancy —
   * not bucket count — is the scale limit). Clamped to [8, 30].
   */
  def nPlanesForCorpus(nRows: Long, targetPerBucket: Long = 256L): Int = {
    val need = math.ceil(math.log(math.max(1.0, nRows.toDouble / targetPerBucket)) /
      math.log(2.0)).toInt
    math.max(8, math.min(30, need))
  }

  /**
   * Embedding-cosine near-duplicate pairs: quantized cosine ≥ minCosQ/1e6.
   * LSH-bucket prefilter (sign random projections) keeps the join keyed;
   * exact quantized verification inside buckets.
   *
   * `nPlanes` must grow with the corpus (fixed plane counts go quadratic:
   * 2^8 buckets over 10^9 vectors is ~4M/bucket) — derive it with
   * [[nPlanesForCorpus]].
   *
   * `probeNeighbors` (multi-probe): one side of the self-join also visits
   * every bucket at hamming distance 1, recovering near-dup pairs whose
   * vectors straddle a single hyperplane (the dominant LSH miss mode).
   * Costs nPlanes+1 probe rows per vector on ONE side — linear, and far
   * cheaper than the alternative recall fix of multiple independent
   * tables.
   */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosQ: Long = 950000L, nPlanes: Int = 12,
      probeNeighbors: Boolean = false): DataFrame = {
    val withB = df.select(col(idCol), col(vecCol),
      VectorOps.lsh_bucket(col(vecCol), nPlanes).as("b0"),
      VectorOps.norm_q(col(vecCol)).as("nq"))
    val l0 = withB.select($"b0", col(idCol).as("id_a"), col(vecCol).as("v_a"), $"nq".as("nq_a"))
    val l =
      if (!probeNeighbors) l0.withColumnRenamed("b0", "bucket")
      else l0.select(explode(array((-1 until nPlanes).map {
          case -1 => $"b0"
          case p  => $"b0".bitwiseXOR(lit(1L << p))
        }: _*)).as("bucket"), $"id_a", $"v_a", $"nq_a")
    val r = withB.select($"b0".as("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"), $"nq".as("nq_b"))
    l.join(r, Seq("bucket"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        floor(VectorOps.cosineScore(VectorOps.dot_q($"v_a", $"v_b"), $"nq_a", $"nq_b") * 1e6)
          .cast(LongType).as("cos_q"))
      // filter BEFORE distinct: cos_q is deterministic per pair, so the
      // result is identical but only qualifying pairs cross the
      // deduplicating exchange (sub-threshold bucket collisions dominate)
      .where($"cos_q" >= minCosQ)
      .distinct() // a pair can surface via its own bucket AND a probe
  }

  /**
   * Incremental greedy near-dup dedup: process a FRESH increment against
   * the accumulated historical band index `(doc_id, band, sig)` without
   * touching historical documents — the pattern that makes near-dedup
   * affordable at 100 TB, where re-shingling the corpus per daily
   * increment is off the table. Combine with
   * [[graft.streaming.ExactlyOnceSink.readBetween]] to feed exactly the
   * new epochs.
   *
   * Rule (same greedy contract as the batch mirror q44 and the streaming
   * operator): a fresh doc is dropped iff any of its band buckets is
   * claimed by a historical doc or an earlier (smaller-id) fresh doc;
   * every fresh doc's buckets enter the index regardless of its own fate.
   * Chunked application over any id-ordered split therefore reproduces
   * the single-batch result exactly (spec-asserted).
   *
   * Returns (keepers = fresh ids that survive, updated band index).
   *
   * Cost note: within the keepers action the two (band, sig) joins reuse
   * one exchange of `freshBands`, so the increment is shingled once per
   * action — but materializing the RETURNED index is a second action and
   * re-runs the projection. A real incremental job should write the
   * returned index to storage and read it back for the next increment
   * (as the spec does with localCheckpoint), never re-derive it.
   */
  def incrementalNearDupKeepers(historyBands: DataFrame, fresh: DataFrame,
      idCol: String, textCol: String, n: Int = 3, bands: Int = 8)
      : (DataFrame, DataFrame) = {
    val freshBands = minhashBandsRowwise(fresh, idCol, textCol, n, bands)
    val stolenByHistory = freshBands
      .join(historyBands.select($"band", $"sig"), Seq("band", "sig"), "left_semi")
      .select(col(idCol))
    val stolenByEarlierFresh = freshBands
      .join(freshBands.select(col(idCol).as("prior_id"), $"band", $"sig"),
        Seq("band", "sig"))
      .where($"prior_id" < col(idCol))
      .select(col(idCol))
    val stolen = stolenByHistory.union(stolenByEarlierFresh).distinct()
    val keepers = fresh.select(col(idCol)).join(stolen, Seq(idCol), "left_anti")
    (keepers, historyBands.unionByName(freshBands))
  }

  /**
   * Benchmark-contamination tagging — the decontamination pass every
   * training-data pipeline runs before a corpus ships: flag corpus docs
   * whose word-`n`-gram shingle sets CONTAIN a large share of some
   * benchmark doc's shingles. Returns one row per flagged
   * `(doc_id, bench_id)` pair with
   * `contain_q = floor(1000·|S(doc) ∩ S(bench)| / |S(bench)|) ≥ minContainQ`
   * — containment is normalized by the BENCHMARK side (a 100-token eval
   * question buried inside a 100 kB page must still flag), which is why
   * this is not the symmetric Jaccard of [[ngramJaccardPairs]].
   *
   * 100 TB shape: the benchmark set is kB–MB scale next to the corpus, so
   * its shingles (and per-bench sizes) are BROADCAST; the corpus
   * contributes exactly one shingling scan and the only shuffle is the
   * (doc, bench) hit count — rows exist only where a shingle actually
   * collides. No corpus self-join anywhere (contrast [[minhashLshPairs]]).
   */
  /**
   * Exact duplicated-span statistics — substring-level dedup (the "exact
   * substring dedup" of Lee et al. 2021, span granularity instead of doc
   * granularity: boilerplate, licenses, and templated passages repeat
   * across otherwise-distinct pages). Every n-token window is reduced to
   * its md5 ROWWISE inside the scan projection (window text never leaves
   * the row); a span hash appearing in ≥ 2 distinct documents is
   * corpus-duplicated. Returns per-doc `(id, dup_spans, dup_mass)`:
   * the count of distinct duplicated spans the doc contains and, as a
   * severity weight, the sum over those spans of how many docs share
   * them.
   *
   * Scale shape: explode factor = tokens/doc (same as [[shingles]]), but
   * what crosses the exchange is (id, 32-hex-char hash) only; the span
   * document-frequency count is ONE shuffle on the hash, and the
   * flag-back join is hash-partitioned on the same key (exchange
   * reuse). A pathologically hot span ("lorem ipsum…" across half the
   * corpus) skews only its count task — AQE skew split applies; the
   * flag-back side stays one row per (doc, span).
   */
  def duplicatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // pin ONE span_hash-keyed exchange: the df-count groupBy and both
    // sides of the flag-back join are co-partitioned on it, so the
    // corpus is tokenized+hashed once and AQE reuses the single shuffle
    // stage for both consumers (the cappedShingles pattern)
    val sp = spanHashRows(df, idCol, textCol, n).repartition($"span_hash")
    val dupDf = sp.groupBy($"span_hash")
      .agg(count(lit(1)).as("n_docs")).where($"n_docs" >= 2)
    sp.join(dupDf, Seq("span_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_spans"), sum($"n_docs").as("dup_mass"))
  }

  /** One row per distinct (id, n-token-window md5) — the hashing is
    * rowwise inside the scan projection via the codegen'd [[SpanHashes]]
    * expression (one tokenizer pass, one reused digest, within-doc
    * dedup in a hash set instead of a shuffle-visible `.distinct()`);
    * see [[duplicatedSpanStats]]. Assumes `idCol` is unique per row
    * (true of every corpus table here) — with duplicate ids the HOF twin
    * additionally deduped ACROSS rows, this form only within a row. */
  def spanHashRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "span width must be >= 2 tokens")
    df.select(col(idCol), explode(span_hashes(col(textCol), n)).as("span_hash"))
  }

  /** One row per (id, window-start pos, window md5) — the POSITIONAL
    * (non-deduped) twin of [[spanHashRows]], feeding span REMOVAL where
    * every occurrence of a duplicated span must be located, not just its
    * existence. Explode factor = tokens/doc. */
  private[graft] def positionalSpanHashRows(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 2, "span width must be >= 2 tokens")
    df.select(col(idCol),
      posexplode(span_hashes(col(textCol), n, dedup = false))
        .as(Seq("pos", "span_hash")))
  }

  /** `span_hashes(text, n): array<string>` Column over [[SpanHashes]]. */
  def span_hashes(text: Column, n: Int, dedup: Boolean = true): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      SpanHashes(org.apache.spark.sql.graftshim.Bridge.expression(text), n, dedup))

  /** Interpreted higher-order-function twin of [[spanHashRows]] — kept as
    * the spec'd semantic oracle for [[SpanHashes]] (value-identical by
    * construction; asserted in DedupSpec over adversarial whitespace).
    * 10–20× slower than the expression form (interpreted HOF chain —
    * same measurement as the minhash note above), so nothing in the
    * serving path uses it. */
  private[graft] def spanHashRowsHof(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 2, "span width must be >= 2 tokens")
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col(idCol), explode(when(size($"toks") >= n,
          transform(sequence(lit(0), size($"toks") - n),
            i => md5(concat_ws(" ",
              (0 until n).map(k => element_at($"toks", i + k + 1)): _*)
              .cast(BinaryType))))
        .otherwise(array().cast("array<string>"))).as("span_hash"))
      .distinct()
  }

  /** Span document-frequency table `(span_hash, n_docs)` — the persisted
    * index behind span-level dedup at scale (keep every hash, not just
    * df ≥ 2: an increment can promote a unique span to duplicated). */
  def spanDf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    spanHashRows(df, idCol, textCol, n)
      .groupBy($"span_hash").agg(count(lit(1)).as("n_docs"))

  /**
   * Incremental span-df maintenance + flagging of the fresh docs only —
   * the [[incrementalNearDupKeepers]] shape at span granularity: history
   * is represented by its persisted `(span_hash, n_docs)` table and is
   * never re-tokenized; an increment hashes ONLY the fresh docs, merges
   * counts (union + one sum-groupBy on the hash — both sides already
   * hash-partitioned by span_hash), and flags fresh docs against the
   * MERGED counts (a fresh span is duplicated when history + fresh
   * occurrences reach 2, so an increment can promote a span that was
   * unique in history). Returns (freshStats = what
   * [[duplicatedSpanStats]] says about the fresh docs against the corpus
   * AS OF this increment — later arrivals can raise a doc's mass, as in
   * any df-style index — , updatedSpanDf to persist). Per-span counts
   * are associative ⇒ the UPDATED TABLE after chunked arrival ≡ one
   * batch build (spec-asserted).
   *
   * PRECONDITION: `fresh` must be DISJOINT from the docs already folded
   * into `historySpanDf` — a re-delivered doc permanently inflates
   * `n_docs` (false duplicated-span promotions). The streaming callers
   * get this for free from the sink manifest's re-delivered-epoch
   * detection (exactly-once epochs); batch callers must feed each doc
   * exactly once.
   */
  def spanStatsIncrement(historySpanDf: DataFrame, fresh: DataFrame,
      idCol: String, textCol: String, n: Int): (DataFrame, DataFrame) = {
    val freshRows = spanHashRows(fresh, idCol, textCol, n)
    val updated = historySpanDf
      .unionByName(freshRows.groupBy($"span_hash")
        .agg(count(lit(1)).as("n_docs")))
      .groupBy($"span_hash").agg(sum($"n_docs").as("n_docs"))
    val freshStats = freshRows
      .join(updated.where($"n_docs" >= 2), Seq("span_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_spans"), sum($"n_docs").as("dup_mass"))
    (freshStats, updated)
  }

  /**
   * Span removal — the corpus REWRITE that exact-substring dedup exists
   * for (Lee et al. 2021 "Deduplicating Training Data Makes Language
   * Models Better": the output is the corpus with duplicated substrings
   * CUT, not a report). Every n-token window of `textCol` whose hash is
   * corpus-duplicated (`n_docs ≥ 2` in `spanDf` — the table [[spanDf]]
   * builds and [[spanStatsIncrement]] maintains) is removed from the
   * doc: overlapping duplicated windows merge into one cut range
   * (token-granular), surviving tokens are rejoined with single spaces.
   * Returns `df` with `textCol` rewritten; a doc with NO duplicated
   * span keeps its ORIGINAL text byte-identical (whitespace is only
   * normalized where a cut actually happened); a fully-duplicated doc
   * becomes the empty string (the caller's length gate drops it).
   *
   * 100 TB shape: positions are located by one codegen'd projection
   * ([[SpanHashes]] positional mode, explode factor tokens/doc) whose
   * rows are (id, pos, 32-hex hash) only; the duplicated-hash probe is
   * one equi-join on the hash against the persisted span-df table
   * (hash-partitioned both sides); cut lists come back as one
   * groupBy(id) of ints; and the rewrite itself is a row-local
   * codegen'd expression ([[RemoveSpans]]) after an equi-join of the
   * cut lists back to the corpus on id. Corpus text crosses exactly one
   * exchange (the cut-list join) — never keyed by span.
   */
  def removeDuplicatedSpans(df: DataFrame, spanDf: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val dup = spanDf.where($"n_docs" >= 2).select($"span_hash")
    val cuts = positionalSpanHashRows(df, idCol, textCol, n)
      .join(dup, Seq("span_hash"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list($"pos")).as("__cut_starts"))
    df.join(cuts, Seq(idCol), "left")
      .withColumn(textCol, when($"__cut_starts".isNotNull,
          remove_spans(col(textCol), $"__cut_starts", n))
        .otherwise(col(textCol)))
      .drop("__cut_starts")
  }

  /** `remove_spans(text, starts, n): string` Column over [[RemoveSpans]]. */
  def remove_spans(text: Column, starts: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      RemoveSpans(org.apache.spark.sql.graftshim.Bridge.expression(text),
        org.apache.spark.sql.graftshim.Bridge.expression(starts), n))

  def contaminationTag(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchIdCol: String, benchTextCol: String,
      n: Int = 3, minContainQ: Long = 500L): DataFrame = {
    val bSh = shingles(
      bench.select(col(benchIdCol).as("bench_id"), col(benchTextCol).as("text")),
      "bench_id", "text", n)
    val bSz = bSh.groupBy($"bench_id").agg(count(lit(1)).as("b_sz"))
    val cSh = shingles(
      corpus.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      "doc_id", "text", n)
    cSh.join(broadcast(bSh), Seq("shingle"))
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(bSz), Seq("bench_id"))
      .select($"doc_id", $"bench_id",
        floor(lit(1000) * $"inter" / $"b_sz").cast(LongType).as("contain_q"))
      .where($"contain_q" >= minContainQ)
  }

  /**
   * Span-level EXACT decontamination — the GPT-3/PaLM/Llama-style
   * benchmark filter: a corpus document is tainted if any exact n-token
   * window of any benchmark document appears verbatim in it (the
   * industry convention is n = 13; [[contaminationTag]] is the softer
   * small-n shingle-CONTAINMENT score, this is the hard exact-window
   * test). Returns one row per corpus doc with ≥ 1 window:
   * `(doc_id, n_spans, hit_spans, tainted)` — distinct n-token windows,
   * how many of them are benchmark windows, and the verdict.
   *
   * 100 TB shape: the benchmark side collapses to its DISTINCT window
   * hashes (eval suites are tiny against the corpus) and is broadcast
   * into the corpus window scan; the corpus is hashed ONCE rowwise
   * (codegen'd [[SpanHashes]]), never shuffled — output is doc-keyed
   * counts. Windows respect document boundaries on both sides.
   */
  def decontaminateBySpans(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchIdCol: String,
      benchTextCol: String, n: Int = 13): DataFrame = {
    val bHash = spanHashRows(
      bench.select(col(benchIdCol).as("bench_id"),
        col(benchTextCol).as("text")), "bench_id", "text", n)
      .select($"span_hash").distinct()
    // ONE corpus pass: left-broadcast the bench hashes into the window
    // stream and take both counts in the same partial-aggregated groupBy
    // (two agg branches would scan + hash the corpus twice).
    spanHashRows(corpus, idCol, textCol, n)
      .join(broadcast(bHash.select($"span_hash", lit(1L).as("hit"))),
        Seq("span_hash"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce($"hit", lit(0L))).as("hit_spans"))
      .withColumn("tainted", $"hit_spans" > 0)
  }

  /**
   * Train/eval SPLIT-LEAKAGE matrix — the self-contamination readout: a
   * held-out split is only held out if its content is absent from
   * train, and web corpora violate that silently (mirrors, boilerplate,
   * near-dups straddling the hash split). For each eval split this
   * reports, over DISTINCT word n-gram shingles: how many the split
   * has, how many of those also occur in train, and the leaked
   * fraction in per-mille — the corpus-level containment twin of
   * [[contaminationTag]] (which scores doc×benchmark pairs; this scores
   * split×train wholesale, the number a release gate thresholds on).
   *
   * 100 TB shape — no self-join, nothing quadratic: the corpus is
   * shingled ONCE ([[shingles]] keyed by the split column, so the
   * per-(split, shingle) distinct collapses map-side before the
   * exchange); one groupBy(shingle) folds presence into per-split 0/1
   * flags via partial max; the matrix itself is a constant-width
   * explode of those flags plus one tiny final aggregate. Shuffled
   * rows are bounded by distinct shingles, never by corpus rows — the
   * same flag-max collapse that makes [[lineDf]] scale. A shingle in
   * BOTH eval splits counts once per split (splits leak independently
   * toward train). Output: `(split, n_shingles, shared_with_train,
   * leak_pm)`, one row per eval label, `leak_pm` NULL for an empty
   * split (no shingles to leak).
   */
  def splitLeakage(df: DataFrame, textCol: String, splitCol: String,
      n: Int, trainLabel: String, evalLabels: Seq[String]): DataFrame = {
    require(evalLabels.nonEmpty, "evalLabels must be non-empty")
    require(!evalLabels.contains(trainLabel),
      s"trainLabel '$trainLabel' cannot also be an eval label")
    require(evalLabels.distinct.size == evalLabels.size,
      s"duplicate eval labels: $evalLabels")
    def flagFor(l: String) =
      max(when(col(splitCol) === l, 1L).otherwise(0L))
    val aggs = flagFor(trainLabel).as("__t") +:
      evalLabels.zipWithIndex.map { case (l, i) => flagFor(l).as(s"__e$i") }
    val flags = shingles(df, splitCol, textCol, n)
      .groupBy($"shingle")
      .agg(aggs.head, aggs.tail: _*)
    flags
      .select(explode(array(evalLabels.zipWithIndex.map { case (l, i) =>
        struct(lit(l).as("split"), col(s"__e$i").as("present"),
          (col(s"__e$i") * $"__t").as("shared"))
      }: _*)).as("x"))
      .groupBy($"x.split".as("split"))
      .agg(sum($"x.present").as("n_shingles"),
        sum($"x.shared").as("shared_with_train"))
      .withColumn("leak_pm", when($"n_shingles" > 0,
        floor(lit(1000) * $"shared_with_train" / $"n_shingles").cast(LongType)))
  }

  /**
   * Pair-set EVAL — recall/precision of one candidate-pair generator
   * against another taken as ground truth, the "measure, don't guess"
   * readout behind every LSH/SimHash/ANN knob in this engine (how many
   * bands? which maxDist? how many probes?). Tuning at 100 TB is done
   * on a deterministic [[Sampling.bernoulli]] slice small enough for an
   * exact all-pairs truth set, then the measured config is applied to
   * the full corpus — this operator is the comparator for that loop
   * (the ANN twin lives in `tools/RecallReport`; this one is
   * oracle-gated and composes with any pair producer).
   *
   * Inputs are canonical pair tables `(id_a, id_b)` with `id_a < id_b`
   * (every producer in [[Dedup]] emits exactly that); extra columns are
   * ignored. ONE full-outer equi-join on the pair key + a single global
   * aggregate — both sides hash-partition on (id_a, id_b), nothing is
   * broadcast, output is one row:
   * `(n_truth, n_got, n_hit, recall_pm, precision_pm)` with the rates
   * in integer per-mille (floor), NULL when the denominator is empty.
   */
  def pairSetEval(truth: DataFrame, got: DataFrame): DataFrame = {
    // distinct before the join: a duplicated pair row on either side
    // would cross-multiply in the full-outer join and silently corrupt
    // every count — cheap insurance (partial-agg) on a MEASUREMENT
    // operator, where a wrong number is worse than a slow one
    val t = truth.select($"id_a", $"id_b").distinct()
      .withColumn("__t", lit(1L))
    val g = got.select($"id_a", $"id_b").distinct()
      .withColumn("__g", lit(1L))
    t.join(g, Seq("id_a", "id_b"), "full_outer")
      .agg(coalesce(sum(coalesce($"__t", lit(0L))), lit(0L)).as("n_truth"),
        coalesce(sum(coalesce($"__g", lit(0L))), lit(0L)).as("n_got"),
        coalesce(sum(coalesce($"__t", lit(0L)) * coalesce($"__g", lit(0L))),
          lit(0L)).as("n_hit"))
      .select($"n_truth", $"n_got", $"n_hit",
        when($"n_truth" > 0, floor(lit(1000) * $"n_hit" / $"n_truth")
          .cast(LongType)).as("recall_pm"),
        when($"n_got" > 0, floor(lit(1000) * $"n_hit" / $"n_got")
          .cast(LongType)).as("precision_pm"))
  }

  /**
   * Line document-frequency table `(line_hash, n_docs)` — the persisted
   * index behind CCNet/RefinedWeb-style LINE-level dedup (drop lines
   * that recur across documents: nav bars, cookie banners, share
   * buttons). `n_docs` counts DISTINCT documents (a line repeated
   * within one doc does not inflate it — `array_distinct` collapses
   * per-row BEFORE the exchange, so the shuffle carries ≤ one row per
   * (doc, distinct line)). Whitespace-only lines are structural, not
   * content — excluded here and always kept by the remover. Lines are
   * matched EXACTLY (byte equality via md5); normalize upstream
   * ([[TextAnalysis.fingerprint]]-style) for a fuzzier merge. Keep every
   * hash, not just df ≥ 2: an increment can promote a unique line.
   */
  def lineDf(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .where(trim($"line") =!= "")
      .groupBy(md5($"line".cast(BinaryType)).as("line_hash"))
      .agg(count(lit(1)).as("n_docs"))

  /** Incremental [[lineDf]] maintenance: fold a fresh epoch into the
    * persisted table (union + re-sum — fresh docs are hashed once, the
    * history is never re-read at text level). PRECONDITION: `fresh` must
    * be disjoint from docs already folded in (exactly-once epochs — the
    * sink manifest's re-delivered-epoch detection guarantees this); a
    * replayed doc would inflate `n_docs`. Chunked ≡ batch (spec'd). */
  def lineDfIncrement(history: DataFrame, fresh: DataFrame,
      textCol: String): DataFrame =
    history.unionByName(lineDf(fresh, textCol))
      .groupBy($"line_hash").agg(sum($"n_docs").as("n_docs"))

  /**
   * Corpus rewrite: lines appearing in ≥ `minDf` distinct docs (per
   * `lineStats` = a [[lineDf]] table) are CUT from every doc; surviving
   * lines rejoin with `\n` in original order. Docs with nothing cut are
   * byte-identical (split/rejoin round-trips trailing empties);
   * whitespace-only lines always survive (paragraph structure is not
   * "duplicated content"). A doc whose every line was cut survives as
   * the empty string — removal must never drop rows.
   *
   * 100 TB shape: one posexplode (rows ≈ lines, each a short string +
   * 16-byte hash), one hash-partitioned anti-join against the flagged
   * subset of the index, one doc-keyed rebuild shuffle — text itself is
   * never the shuffle key. Same silhouette as [[removeDuplicatedSpans]].
   */
  def removeDuplicatedLines(df: DataFrame, lineStats: DataFrame,
      idCol: String, textCol: String, minDf: Long = 2L): DataFrame = {
    val dup = lineStats.where($"n_docs" >= minDf).select($"line_hash")
    val kept = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("__pos", "__line")))
      .withColumn("__h", md5($"__line".cast(BinaryType)))
      .join(dup, $"__h" === dup("line_hash") && trim($"__line") =!= "",
        "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct($"__pos", $"__line"))),
          x => x.getField("__line")), "\n").as("__rebuilt"))
    df.join(kept, Seq(idCol), "left")
      .withColumn(textCol, coalesce($"__rebuilt", lit("")))
      .drop("__rebuilt")
  }

  /** Per-row minhash band signatures (see [[MinHashBandSigs]]). */
  def minhash_band_sigs(text: Column, n: Int, bands: Int): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      MinHashBandSigs(org.apache.spark.sql.graftshim.Bridge.expression(text), n, bands))

  /**
   * Row-wise twin of [[minhashBands]]: same (id, band, sig) rows, but the
   * signatures are computed inside one codegen'd expression per input row
   * instead of explode→shuffle→min-agg. Value-identical by construction
   * (spec-asserted); this is the form a STREAM needs, where a per-row
   * projection is free but a stateful min-aggregation is not.
   */
  def minhashBandsRowwise(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8): DataFrame =
    df.select(col(idCol), posexplode(minhash_band_sigs(col(textCol), n, bands))
        .as(Seq("band", "sig")))
      .select(col(idCol), $"band".cast(IntegerType).as("band"), $"sig")

  /** `winnow_hashes(text, n, w): array<string>` of `"pos:hex"` local
    * fingerprints (see [[WinnowHashes]]). */
  def winnow_hashes(text: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      WinnowHashes(org.apache.spark.sql.graftshim.Bridge.expression(text), n, w))

  /**
   * Winnowing local fingerprints (Schleimer/Wilkerson/Aiken 2003, the
   * MOSS algorithm) — one row per selected `(id, pos, fp)`: in every
   * window of `w` consecutive n-token shingle hashes, the RIGHTMOST
   * minimal hash is selected; the distinct selections are the doc's
   * fingerprints. The winnowing GUARANTEE (the property none of the
   * other fingerprint flavors here has): any shared token run of length
   * ≥ `w + n − 1` between two docs produces at least one SHARED
   * fingerprint, while only ~2/(w+1) of all windows are kept — `w` is
   * the standard index-size lever (density↔granularity).
   *
   * 100 TB shape: selection is ONE row-local codegen'd pass (monotonic
   * deque inside [[WinnowHashes]] — O(tokens) per doc, never a
   * token-scale window shuffle); downstream matching is an equi-join on
   * the fingerprint hash against a `(fp, n_docs)` table, exactly the
   * [[spanDf]] machinery at ~2/(w+1) the rows.
   */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame =
    df.select(col(idCol),
        explode(winnow_hashes(col(textCol), n, w)).as("pf"))
      .select(col(idCol),
        split($"pf", ":").getItem(0).cast(LongType).as("pos"),
        split($"pf", ":").getItem(1).as("fp"))
}

/**
 * All `bands` minhash band signatures of a text in ONE row-local pass:
 * `sig(b) = min over word-n-gram shingles of md5hex(shingle || '|' || b)`
 * — definitionally identical to [[Dedup.minhashBands]]'s explode+min-agg
 * (same trim/split/shingle/md5 semantics, so the two forms are
 * interchangeable and both match the DuckDB oracle fragment).
 *
 * Why an expression: streaming ingest cannot afford a stateful
 * min-aggregation just to build signatures — this keeps signature
 * construction a stateless projection inside whole-stage codegen, leaving
 * the stream's only stateful operator the dedup decision itself. (Not a
 * nested HOF chain: those run interpreted — measured 10-20× slower, see
 * the note above [[Dedup.minhashLshPairs]].)
 *
 * Returns `array<string>` of `bands` lowercase-hex digests; empty array
 * when the doc has no shingles (< n tokens) — mirroring the agg form,
 * where such docs simply have no band rows.
 */
case class MinHashBandSigs(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(n > 0 && bands > 0 && bands <= 64, "need n > 0 and bands in [1,64]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_sigs requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashBandSigs.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MinHashBandSigs.compute($c, $n, $bands)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MinHashBandSigs =
    copy(child = newChild)
}

object MinHashBandSigs {
  import java.nio.charset.StandardCharsets
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val HEX = "0123456789abcdef".toCharArray
  private val splitter = java.util.regex.Pattern.compile("\\s+")

  // Per-shingle cost is `bands` MD5 compressions and that is inherent to
  // the oracle-pinned definition sig = md5(shingle || '|' || band): MD5
  // only compresses on 64-byte boundaries and at digest(), so for typical
  // sub-56-byte shingles each band's digest is exactly ONE compression —
  // cloning a mid-state digest after update(shingle) would save only the
  // small buffer copy, not the compression. (Driver-vs-local bench deltas
  // on q44 were page-cache warm-up, not a plan defect: same JVM, same
  // plan, 5x gap collapses on a warm second run.)
  //
  // "|<band>" suffix bytes, computed once per band count per JVM (not per
  // shingle x band: that was one tiny allocation per digest update)
  private val sepCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def seps(bands: Int): Array[Array[Byte]] =
    sepCache.computeIfAbsent(bands,
      _ => Array.tabulate(bands)(b => ("|" + b).getBytes(StandardCharsets.UTF_8)))

  /** Unsigned lexicographic byte-array compare (== hex-string order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String, n: Int, bands: Int): GenericArrayData = {
    // UTF8String.trim() strips 0x20 only — same as Spark's trim(col);
    // Pattern.split(s, -1) keeps leading/trailing empties — same as
    // Spark's split(str, "\\s+") with its default limit of -1
    val s = text.trim().toString
    val toks = splitter.split(s, -1)
    val out = new Array[Array[Byte]](bands)
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      val sep = seps(bands)
      val md = Md5Hash.local()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        val shingle = sb.toString
        if (seen.add(shingle)) {
          val shingleBytes = shingle.getBytes(StandardCharsets.UTF_8)
          var b = 0
          while (b < bands) {
            md.reset()
            md.update(shingleBytes)
            md.update(sep(b))
            val d = md.digest()
            if (out(b) == null || less(d, out(b))) out(b) = d
            b += 1
          }
        }
        i += 1
      }
    }
    if (out(0) == null) return new GenericArrayData(Array.empty[Any])
    val hex = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val d = out(b)
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = HEX((d(j) >> 4) & 0xf); cs(2 * j + 1) = HEX(d(j) & 0xf)
        j += 1
      }
      hex(b) = UTF8String.fromString(new String(cs))
      b += 1
    }
    new GenericArrayData(hex)
  }
}

/**
 * All distinct n-token-window md5 hex digests of a text in ONE row-local
 * pass — the codegen'd form of the `transform(sequence(...), i =>
 * md5(concat_ws(" ", window)))` HOF tree in [[Dedup.spanHashRowsHof]]
 * (same trim/split/join/md5 semantics, so the two forms are
 * interchangeable and both match the DuckDB oracle fragment; asserted in
 * DedupSpec with adversarial-whitespace fuzz).
 *
 * Why an expression: the span pass reads EVERY token of the corpus —
 * at 100 TB the interpreted-HOF tax (measured 10–20× on the minhash
 * twin, see [[MinHashBandSigs]]) is the difference between one pass and
 * a cluster-week. This keeps span hashing a stateless projection inside
 * whole-stage codegen: one tokenizer pass, one reused MD5 instance, one
 * StringBuilder, within-doc dedup in a local hash set (the HOF form
 * needed a plan-level `.distinct()` for that).
 *
 * Dedup key is the digest hex (exactly what the HOF `.distinct()`
 * deduped on), not the shingle string; a repeated shingle is skipped
 * before hashing via a separate shingle set, so repeats cost a set probe,
 * not an MD5 compression.
 *
 * Returns `array<string>` of 32-hex-char digests in first-occurrence
 * order (order is irrelevant downstream — every consumer explodes into a
 * groupBy); empty array when the doc has < n tokens.
 *
 * With `dedup = false` the dedup sets are skipped and EVERY window's
 * digest is emitted in window order — element i is the hash of the
 * window starting at 0-based token i (`posexplode` recovers positions;
 * this is the form span REMOVAL consumes, see
 * [[Dedup.removeDuplicatedSpans]]).
 */
case class SpanHashes(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, dedup: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(n >= 2, "span width must be >= 2 tokens")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hashes requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.SpanHashes.compute($c, $n, $dedup)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): SpanHashes =
    copy(child = newChild)
}

/**
 * `word_shingles(text, n): array<string>` — the distinct word n-grams of
 * a document as ONE codegen'd row-local pass: tokenize (trim-0x20 +
 * `\s+` split, Spark `split` semantics — the [[SpanHashes]] tokenizer),
 * join each n-window with single spaces, dedup in first-occurrence order
 * (the `array_distinct` key). Value-identical to the HOF chain
 * `array_distinct(transform(sequence(…), concat_ws(" ", element_at…)))`
 * (spec-asserted), without the interpreted per-window lambda.
 */
case class WordShingles(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(n >= 1, "shingle width must be >= 1 token")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val splitter = java.util.regex.Pattern.compile("\\s+")

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = splitter.split(text.trim().toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

object SpanHashes {
  import java.nio.charset.StandardCharsets
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val HEX = "0123456789abcdef".toCharArray
  private val splitter = java.util.regex.Pattern.compile("\\s+")

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String, n: Int, dedup: Boolean): GenericArrayData = {
    // UTF8String.trim() strips 0x20 only — same as Spark's trim(col);
    // Pattern.split(s, -1) keeps leading/trailing empties — same as
    // Spark's split(str, "\\s+") with its default limit of -1
    val s = text.trim().toString
    val toks = splitter.split(s, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seenShingle = if (dedup) new java.util.HashSet[String]() else null
    // dedup mode: LinkedHashSet on the hex digest = the HOF .distinct()
    // key, kept in first-occurrence order; the shingle set above just
    // saves the MD5 work for repeats (distinct shingle ⇒ distinct digest
    // modulo md5 collision, which the digest set absorbs either way).
    // positional mode: plain per-window append, element i = window at i.
    val outSet = if (dedup) new java.util.LinkedHashSet[UTF8String]() else null
    val outArr = if (dedup) null else new Array[Any](toks.length - n + 1)
    val md = Md5Hash.local()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
      val shingle = sb.toString
      if (!dedup || seenShingle.add(shingle)) {
        md.reset()
        md.update(shingle.getBytes(StandardCharsets.UTF_8))
        val d = md.digest()
        val cs = new Array[Char](32)
        var j = 0
        while (j < 16) {
          cs(2 * j) = HEX((d(j) >> 4) & 0xf); cs(2 * j + 1) = HEX(d(j) & 0xf)
          j += 1
        }
        val hex = UTF8String.fromString(new String(cs))
        if (dedup) outSet.add(hex) else outArr(i) = hex
      }
      i += 1
    }
    if (!dedup) return new GenericArrayData(outArr)
    val arr = new Array[Any](outSet.size)
    val it = outSet.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

/**
 * Row-local span cutter behind [[Dedup.removeDuplicatedSpans]]:
 * `remove_spans(text, starts, n)` tokenizes `text` exactly like
 * [[SpanHashes]] (trim-0x20 + `\s+` split, so a position produced by the
 * positional hash pass addresses the same token here), marks every token
 * in `[p, p+n)` for each 0-based window start `p` in `starts` (overlaps
 * merge naturally in the boolean coverage array), and rejoins the
 * surviving tokens with single spaces. Empty `starts` returns the input
 * byte-identical; cutting every token returns `""`. Out-of-range starts
 * are clamped (a doc edited between passes cannot crash the rewrite).
 *
 * Codegen'd projection — the rewrite pass streams through the corpus
 * inside whole-stage codegen with one boolean array + one StringBuilder
 * per row, no shuffle of its own.
 */
case class RemoveSpans(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(n >= 2, "span width must be >= 2 tokens")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "remove_spans"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"remove_spans requires (string, array<int>), got ($l, $r)")
  }

  override def nullSafeEval(text: Any, starts: Any): Any =
    RemoveSpans.compute(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      starts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.operators.RemoveSpans.compute($t, $s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): RemoveSpans =
    copy(left = newLeft, right = newRight)
}

object RemoveSpans {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val splitter = java.util.regex.Pattern.compile("\\s+")

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String, starts: ArrayData, n: Int): UTF8String = {
    val m = starts.numElements()
    if (m == 0) return text
    val s = text.trim().toString
    val toks = splitter.split(s, -1)
    val cut = new Array[Boolean](toks.length)
    var i = 0
    while (i < m) {
      var j = math.max(starts.getInt(i), 0)
      val end = math.min(j.toLong + n, toks.length.toLong).toInt
      while (j < end) { cut(j) = true; j += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    var first = true
    var k = 0
    while (k < toks.length) {
      if (!cut(k)) {
        if (!first) sb.append(' ')
        sb.append(toks(k))
        first = false
      }
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/**
 * `winnow_hashes(text, n, w): array<string>` — winnowing fingerprint
 * selection as one codegen'd row-local pass. Tokenization and shingle
 * hashing are EXACTLY [[SpanHashes]]' positional mode (trim + `\s+`,
 * space-joined n-token shingles, md5 hex), so a winnowing fingerprint is
 * always a valid span hash and the two index families compose. Over the
 * positional hash sequence, each window of `w` consecutive hashes
 * selects its minimal hash — rightmost occurrence on ties (the paper's
 * rule; hex strings compare like the digest bytes) — via a monotonic
 * deque, O(tokens) per row; distinct selections are emitted as
 * `"pos:hex"` in first-selection order. Docs with fewer than `w` windows
 * are winnowed as ONE window (their single rightmost-min fingerprint) —
 * the guarantee below then still holds doc-internally.
 *
 * Guarantee (spec-asserted with planted runs): two docs sharing a token
 * run of length ≥ `w + n − 1` share ≥ 1 fingerprint hash.
 */
case class WinnowHashes(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(n >= 1, "shingle width must be >= 1 token")
  require(w >= 1, "winnowing window must be >= 1 shingle")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_hashes requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.WinnowHashes.compute($c, $n, $w)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {
  import java.nio.charset.StandardCharsets
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val HEX = "0123456789abcdef".toCharArray
  private val splitter = java.util.regex.Pattern.compile("\\s+")

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String, n: Int, w: Int): GenericArrayData = {
    // tokenize + hash exactly like SpanHashes.compute positional mode
    val s = text.trim().toString
    val toks = splitter.split(s, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    // empty/whitespace-only doc: split yields [""] — at n = 1 that must
    // NOT produce an md5("") fingerprint every empty doc would share
    if (toks.length == 1 && toks(0).isEmpty)
      return new GenericArrayData(Array.empty[Any])
    val nWin = toks.length - n + 1
    val hashes = new Array[String](nWin)
    val md = Md5Hash.local()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nWin) {
      sb.setLength(0)
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
      md.reset()
      md.update(sb.toString.getBytes(StandardCharsets.UTF_8))
      val d = md.digest()
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = HEX((d(j) >> 4) & 0xf); cs(2 * j + 1) = HEX(d(j) & 0xf)
        j += 1
      }
      hashes(i) = new String(cs)
      i += 1
    }
    // monotonic deque of indices, values strictly increasing front→back;
    // pop-while-back>=new keeps the RIGHTMOST occurrence among equals
    val win = math.min(w, nWin)
    val deque = new Array[Int](nWin)
    var head = 0; var tail = 0 // [head, tail) live
    val selected = new java.util.LinkedHashSet[Integer]()
    var j = 0
    while (j < nWin) {
      while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(j)) >= 0)
        tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - win) head += 1
      if (j >= win - 1) selected.add(Integer.valueOf(deque(head)))
      j += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) {
      val p = it.next().intValue
      out(o) = UTF8String.fromString(p.toString + ":" + hashes(p))
      o += 1
    }
    new GenericArrayData(out)
  }
}
