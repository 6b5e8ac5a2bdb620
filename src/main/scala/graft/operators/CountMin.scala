package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/**
 * Count-Min frequency sketch — the third of the engine's mergeable
 * sketch-as-a-table trio: [[BloomSet]] answers membership,
 * [[DistinctSketch]] cardinality, this one answers "ABOUT how often has
 * this key occurred?" in `depth·2^wBits` counters instead of a counter
 * per distinct key — the per-term traffic / hot-token / hot-host meter
 * a 10^12-event stream can afford to keep forever. Cormode &
 * Muthukrishnan (J. Algorithms 2005) is the public source; the
 * one-sided guarantee is the whole point: estimates NEVER undercount,
 * and overcount by more than 2N/2^wBits on less than (1/2)^depth of
 * probes (pairwise-independence bound quoted for the double-hashing
 * scheme below; in practice md5 mixing tracks it).
 *
 * REPRESENTATION — `(row, col, cnt)`, only nonzero counters: build is
 * ONE partial-agg exchange (`groupBy(row, col).sum`), map-side combine
 * collapsing the stream to ≤ depth·2^wBits rows. The fold is `sum` — a
 * commutative monoid but NOT idempotent: unlike the Bloom/HLL folds,
 * [[cmsIncrement]] inherits the count-shaped-increment contract
 * ([[Dedup.spanStatsIncrement]], [[OrderStats.histogramIncrement]]):
 * `fresh` must be DISJOINT from what the sketch already absorbed —
 * exactly-once epochs through the sink's manifest, or a re-delivered
 * chunk inflates counters permanently. (That contract difference is
 * intrinsic: a counter cannot tell "again" from "more".) The classic
 * conservative-update variant is deliberately absent — it needs
 * sequential read-modify-write per arrival, which no distributed
 * partial aggregation can express; the plain CM bound is what you get.
 *
 * HASHING — the [[BloomSet]] scheme verbatim: one md5 per key, h1 =
 * hex digits 1–12, h2 = 13–24, col_i = (h1 + i·h2) mod 2^wBits for
 * row i < depth. Deterministic and oracle-replayable: q118
 * value-checks the estimates themselves, including their overcounts.
 *
 * 100 TB shape: the sketch never grows past depth·2^wBits rows however
 * many keys flow through; probes broadcast it (a 2^20-column, depth-4
 * sketch is ~64 MiB worst case, and real ones are far sparser) and the
 * per-key estimate is a `min` over depth joined counters. ε shrinks
 * with 2^wBits (space), δ with depth (rows): size to the tail you care
 * about, not to the key cardinality.
 */
object CountMin {

  private def md5Hex(key: Column): Column =
    md5(key.cast(StringType).cast(BinaryType))

  private def hexLong(h: Column, off: Int, len: Int): Column =
    conv(substring(h, off, len), 16, 10).cast(LongType)

  private def requireParams(wBits: Int, depth: Int): Unit = {
    require(wBits >= 4 && wBits <= 26, s"wBits in [4,26] (got $wBits)")
    require(depth >= 1 && depth <= 8, s"depth in [1,8] (got $depth)")
  }

  /** One row per (input row, sketch row): input cols + `__row`, `__col`. */
  private def cells(df: DataFrame, keyCol: String, wBits: Int,
      depth: Int): DataFrame = {
    // null keys dropped (as in BloomSet.bitRows: a junk null-cell
    // counter row would otherwise persist in the sketch)
    val withH = df.where(col(keyCol).isNotNull)
      .withColumn("__mh", md5Hex(col(keyCol)))
      .withColumn("__h1", hexLong(col("__mh"), 1, 12))
      .withColumn("__h2", hexLong(col("__mh"), 13, 12))
    val pieces = (0 until depth).map { i =>
      struct(lit(i.toLong).as("r"),
        (col("__h1") + lit(i.toLong) * col("__h2"))
          .bitwiseAND(lit((1L << wBits) - 1)).as("c"))
    }
    withH.withColumn("__cell", explode(array(pieces: _*)))
      .withColumn("__row", col("__cell.r"))
      .withColumn("__col", col("__cell.c"))
      .drop("__mh", "__h1", "__h2", "__cell")
  }

  /** Build the sketch over `df` (one increment per input ROW — pre-sum
    * duplicates upstream only if you mean to): `(row, col, cnt)`. */
  def cmsOf(df: DataFrame, keyCol: String, wBits: Int, depth: Int): DataFrame = {
    requireParams(wBits, depth)
    cells(df.select(col(keyCol)), keyCol, wBits, depth)
      .groupBy(col("__row").as("row"), col("__col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Fold fresh arrivals into an existing sketch (same wBits/depth — the
   * caller's contract). `sum` fold: commutative and associative but NOT
   * idempotent — `fresh` must be disjoint from rows already absorbed
   * (exactly-once epochs; see class doc). Contrast
   * [[BloomSet.bloomIncrement]] / [[DistinctSketch.registersIncrement]],
   * whose or/max folds absorb replays for free.
   */
  def cmsIncrement(cms: DataFrame, fresh: DataFrame, keyCol: String,
      wBits: Int, depth: Int): DataFrame = {
    requireParams(wBits, depth)
    cms.unionByName(cmsOf(fresh, keyCol, wBits, depth))
      .groupBy(col("row"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /**
   * Point estimates: `df`'s rows + `est_count` = min over the key's
   * depth counters (absent counter = 0). Never undercounts a key the
   * sketch absorbed. Distinct keys are probed once (depth rows each)
   * against the broadcast sketch and the verdict joins back — the
   * [[BloomSet.probe]] shape.
   */
  def estimate(df: DataFrame, keyCol: String, cms: DataFrame, wBits: Int,
      depth: Int, broadcastCms: Boolean = true): DataFrame = {
    requireParams(wBits, depth)
    require(!df.columns.contains("est_count"),
      "input already has an est_count column — rename it first")
    val c0 = cms.select(col("row").as("__crow"), col("col").as("__ccol"),
      col("cnt").as("__ccnt"))
    val c = if (broadcastCms) broadcast(c0) else c0
    val kb = cells(df.select(col(keyCol)).distinct(), keyCol, wBits, depth)
    val verdict = kb
      .join(c, kb("__row") === c("__crow") && kb("__col") === c("__ccol"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__ccnt"), lit(0L))).as("est_count"))
    df.join(verdict, Seq(keyCol))
  }
}
