package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/**
 * Distributed Bloom seen-set — the crawl-frontier admission sketch: "has
 * this URL (probably) been fetched before?" answered in O(1) bits per
 * key instead of a full exact join against crawl history. The exact
 * twin in this engine is [[UrlOps.latestSnapshot]] / the q86 snapshot
 * table (definitive, but a key-wide shuffle against the whole history);
 * the Bloom gate is the cheap FIRST pass a frontier runs at ingest —
 * definite-new keys skip the history join entirely, and only the
 * maybe-seen minority (true re-crawls + the tunable false-positive
 * sliver) pays for exact confirmation. The reference's nearest device
 * is `RefreshingImageFetcher` (`fetcher/RefreshingImageFetcher.java:33`),
 * which re-fetches the same URLs forever and leaves downstream to cope
 * with re-arrivals; this operator is the admission control that design
 * never had. Bloom (CACM 1970) / Broder & Mitzenmacher's survey are the
 * public sources for the math.
 *
 * REPRESENTATION — a table, not a blob: `(shard, word_idx, bits)` with
 * 32 bits packed per word and only NONZERO words materialized. Three
 * consequences, each load-bearing at 100 TB:
 *   - build is ONE partial-agg exchange (`groupBy(shard, word_idx).agg
 *     (bit_or)`), map-side combine collapsing to ≤ m/32 rows per shard;
 *   - merge/increment is the same `bit_or` fold — a commutative,
 *     idempotent monoid, so epoch increments REPLAY-ABSORB re-delivered
 *     chunks (re-OR-ing set bits is a no-op; contrast
 *     [[Dedup.spanStatsIncrement]], whose counts require exactly-once
 *     epochs) and shard-local blooms union into global ones for free;
 *   - the filter never transits the driver — no `collect`, no giant
 *     broadcast blob built host-side.
 *
 * HASHING — engine-portable and oracle-replayable, like every hash in
 * this engine: one md5 per key; h1 = hex digits 1–12, h2 = 13–24
 * (48-bit each), shard = digits 25–32 mod `shards`; bit positions are
 * Kirsch–Mitzenmacher double hashing, pos_i = (h1 + i·h2) mod mBits for
 * i < kHashes (i·h2 ≤ 2^51 + 2^48 — exact in longs, exact in the
 * oracle's BIGINT replay). `mBits` must be a power of two so the mod is
 * a mask (and the DuckDB replay's `%` agrees bit-for-bit). Words are 32
 * bits so every mask < 2^32 and the oracle's `1::BIGINT << s` never
 * touches the sign bit. False positives are therefore DETERMINISTIC:
 * the same key set and parameters flag the same keys everywhere, which
 * is what lets q116 value-check the FP count itself.
 *
 * SIZING / 100 TB shape: per-shard false-positive rate at n keys is
 * (1 - e^(-k·n/m))^k — 10 bits/key at k=7 gives <1%. A 10^12-key
 * frontier wants ~1.2 TiB of bits: never one broadcast table. That is
 * what `shards` is for — the keyspace splits by an INDEPENDENT hash into
 * `shards` blooms of mBits each, probes route to one shard, and the
 * probe join (`shard`, `word_idx`) is an ordinary equi-join that Spark
 * shuffles only when the bloom side outgrows the broadcast threshold
 * (pass `broadcastBloom = false` then). Per-shard tables also GC
 * independently: rebuild one shard's bloom when its region of the
 * frontier churns, not the whole filter.
 */
object BloomSet {

  /** Bits packed per `bits` word — 32, so masks stay below 2^32 and the
    * oracle's signed-BIGINT shifts stay positive. */
  val WordBits = 32

  private def md5Hex(key: Column): Column =
    md5(key.cast(StringType).cast(BinaryType))

  /** `len` hex digits of `h` from 1-based `off` as an exact long
    * (len ≤ 15 keeps `conv`'s parse inside positive-long range). */
  private def hexLong(h: Column, off: Int, len: Int): Column =
    conv(substring(h, off, len), 16, 10).cast(LongType)

  private def requireParams(mBits: Long, kHashes: Int, shards: Int): Unit = {
    require(mBits >= WordBits && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= $WordBits (got $mBits)")
    require(kHashes >= 1 && kHashes <= 8, s"kHashes in [1,8] (got $kHashes)")
    require(shards >= 1, s"shards must be positive (got $shards)")
  }

  /** One row per (input row, hash i): input columns + `__shard`,
    * `__word`, `__mask`. All arithmetic is codegen'd built-ins (one md5
    * per row, bitwise word/mask split, generator explode) — no HOFs.
    * Null keys are dropped here (a frontier with null URLs is
    * upstream's bug — but letting md5(null) propagate would plant a
    * junk all-null row in the filter table). */
  private def bitRows(df: DataFrame, keyCol: String, mBits: Long,
      kHashes: Int, shards: Int): DataFrame = {
    val withH = df.where(col(keyCol).isNotNull)
      .withColumn("__mh", md5Hex(col(keyCol)))
      .withColumn("__h1", hexLong(col("__mh"), 1, 12))
      .withColumn("__h2", hexLong(col("__mh"), 13, 12))
      .withColumn("__shard",
        if (shards == 1) lit(0L) else hexLong(col("__mh"), 25, 8) % shards)
    val pieces = (0 until kHashes).map { i =>
      val pos = (col("__h1") + lit(i.toLong) * col("__h2"))
        .bitwiseAND(lit(mBits - 1))
      struct(
        call_function("shiftright", pos, lit(5)).as("w"),
        call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(31L)).cast(IntegerType)).as("m"))
    }
    withH.withColumn("__bit", explode(array(pieces: _*)))
      .withColumn("__word", col("__bit.w"))
      .withColumn("__mask", col("__bit.m"))
      .drop("__mh", "__h1", "__h2", "__bit")
  }

  /**
   * Build the filter over `df`'s keys: `(shard, word_idx, bits)`, only
   * nonzero words, ≤ shards·mBits/32 rows. Duplicate keys are free
   * (idempotent ORs), so no distinct pass is needed or taken.
   */
  def bloomOf(df: DataFrame, keyCol: String, mBits: Long, kHashes: Int,
      shards: Int = 1): DataFrame = {
    requireParams(mBits, kHashes, shards)
    bitRows(df.select(col(keyCol)), keyCol, mBits, kHashes, shards)
      .groupBy(col("__shard").as("shard"), col("__word").as("word_idx"))
      .agg(bit_or(col("__mask")).as("bits"))
  }

  /**
   * Fold `fresh` keys into an existing filter (same parameters — the
   * caller's contract, as with every index increment in this engine).
   * Pure `bit_or` monoid fold: commutative, associative, IDEMPOTENT —
   * a re-delivered chunk changes nothing, so this increment needs no
   * exactly-once guard at all.
   */
  def bloomIncrement(bloom: DataFrame, fresh: DataFrame, keyCol: String,
      mBits: Long, kHashes: Int, shards: Int = 1): DataFrame = {
    requireParams(mBits, kHashes, shards)
    bloom.unionByName(bloomOf(fresh, keyCol, mBits, kHashes, shards))
      .groupBy(col("shard"), col("word_idx"))
      .agg(bit_or(col("bits")).as("bits"))
  }

  /**
   * Probe: `df` + `maybe_seen` (true = all kHashes bits set — inserted
   * keys ALWAYS true, never a false negative; uninserted keys true at
   * the deterministic FP rate). Distinct keys are probed once (k
   * generator rows each), joined against the filter on (shard, word),
   * folded with `bool_and`, and the verdict joins back onto `df` — two
   * partial-agg-friendly exchanges on the key, or fewer when AQE reuses
   * the gate's own key partitioning downstream. `broadcastBloom` (default
   * true) hints the filter side — right whenever shards·mBits/8 is
   * megabytes; pass false at frontier scale and the probe becomes a
   * plain shuffle equi-join on (shard, word_idx).
   */
  def probe(df: DataFrame, keyCol: String, bloom: DataFrame, mBits: Long,
      kHashes: Int, shards: Int = 1,
      broadcastBloom: Boolean = true): DataFrame = {
    requireParams(mBits, kHashes, shards)
    require(!df.columns.contains("maybe_seen"),
      "input already has a maybe_seen column — rename it first")
    val b0 = bloom.select(col("shard").as("__bshard"),
      col("word_idx").as("__bword"), col("bits").as("__bbits"))
    val b = if (broadcastBloom) broadcast(b0) else b0
    val kb = bitRows(df.select(col(keyCol)).distinct(),
      keyCol, mBits, kHashes, shards)
    val verdict = kb
      .join(b, kb("__shard") === b("__bshard") && kb("__word") === b("__bword"),
        "left")
      .groupBy(col(keyCol))
      .agg(bool_and(col("__bbits").isNotNull &&
        col("__bbits").bitwiseAND(col("__mask")) === col("__mask"))
        .as("maybe_seen"))
    df.join(verdict, Seq(keyCol))
  }

  /** The admission gate itself: rows whose key is DEFINITELY new (all
    * inserted keys removed; a deterministic FP sliver removed with
    * them — the trade a frontier makes on purpose, and exactly why the
    * maybe-seen stream goes on to the exact snapshot join instead of
    * the bin). */
  def gate(df: DataFrame, keyCol: String, bloom: DataFrame, mBits: Long,
      kHashes: Int, shards: Int = 1,
      broadcastBloom: Boolean = true): DataFrame =
    probe(df, keyCol, bloom, mBits, kHashes, shards, broadcastBloom)
      .where(!col("maybe_seen")).drop("maybe_seen")
}
