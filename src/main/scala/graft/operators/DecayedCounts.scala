package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Epoch-decayed counters — the "trending keys" verb: a per-key activity
 * score where each epoch's events count in full and every earlier
 * epoch's contribution HALVES per epoch of age,
 *
 *   S(e) = floor(S(prev) / 2^(e - prev)) + count(e)
 *
 * so a burst three days ago is worth 1/8 of a burst today and idle keys
 * age to zero instead of dominating forever (the failure mode of a
 * cumulative count) — what a crawl scheduler ranks hosts by and an
 * ops dashboard calls "hot right now". The reference's nearest device
 * is the TTL'd sliding `History` buffer (`bolt/BatchInputBolt.java:241`
 * with `batcher/SlidingWindowBatcher.java`): keep recent tuples, expire
 * old ones. The decayed counter is that idea with O(1) state per key —
 * no tuple retention at all — at the cost of a geometric (rather than
 * cliff) forget curve.
 *
 * Determinism is the design constraint, as everywhere in this engine:
 * the fold is pure INTEGER arithmetic (right-shift = floor-halving,
 * nonnegative scores), so results are bit-identical across engines,
 * partitionings and replays — the q114 oracle replays the exact fold
 * with DuckDB's `list_reduce`. Epochs with zero events for a key emit
 * nothing and cost nothing: the gap is folded in one shift (capped —
 * a gap ≥ 63 is a hard zero, not a Java `%64` shift wraparound).
 *
 * 100 TB shape: `groupBy(key, epoch)` collapses events map-side (the
 * per-key epoch list is days-scale, never event-scale), one more
 * partial-agg exchange on the key collects it, and the fold itself is
 * row-local over that tiny sorted array. The per-row lambda runs
 * interpreted (nested-HOF rule), but over ≤ #epochs elements per key —
 * the q61 row-local-HOF reasoning, not the span-hash hot path.
 */
object DecayedCounts {

  /** floor(s / 2^gap) for nonnegative s. Shifts of ≥ 63 are an explicit
    * zero — Java's `>>` takes the shift mod 64, which would RESURRECT
    * ancient scores on long gaps. */
  private def decay(s: Column, gap: Column): Column =
    when(gap >= 63, lit(0L))
      .otherwise(call_function("shiftright", s, gap.cast("int")))

  /**
   * Final decayed score per key after folding every present epoch in
   * order: `(keyCol, last_epoch, score)` — the score AS OF each key's
   * newest active epoch. Compare keys at a common horizon by decaying
   * `score` by `(horizon - last_epoch)` — that shift is exactly what
   * the fold itself would do, so serving it stays row-local.
   */
  def decayedByKey(df: DataFrame, keyCol: String, epochCol: String): DataFrame = {
    val counts = epochCounts(df, keyCol, epochCol)
    counts.groupBy(col(keyCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("e"), col("s")))),
        // sentinel zero: the first fold step must NOT compute e - pe
        // (ANSI long overflow against MinValue) — CaseWhen evaluates
        // its branches lazily, so the guard below keeps the sentinel
        // subtraction from ever running
        struct(lit(Long.MinValue).as("e"), lit(0L).as("s")),
        (acc, x) => struct(x.getField("e").as("e"),
          (when(acc.getField("e") === Long.MinValue, lit(0L))
            .otherwise(decay(acc.getField("s"),
              x.getField("e") - acc.getField("e")))
            + x.getField("s")).as("s"))).as("__f"))
      .select(col(keyCol), col("__f.e").as("last_epoch"),
        col("__f.s").as("score"))
  }

  /**
   * The full decayed SERIES: one row per (key, active epoch) with the
   * score as of that epoch — every prefix of [[decayedByKey]]'s fold,
   * and the batch mirror of the live operator
   * ([[graft.streaming.Trending]] emits exactly these rows watermark-
   * final). Same two partial-agg exchanges; the fold accumulates its
   * intermediate steps into a per-key array (≤ #active epochs) and
   * explodes it — row-local, never an event-scale window.
   */
  /** Per-(key, epoch) counts with the integral-epoch guard: a silently
    * floor-truncated DOUBLE epoch would fold events into wrong buckets. */
  private def epochCounts(df: DataFrame, keyCol: String,
      epochCol: String): DataFrame = {
    require(OrderStats.integralTypes.contains(df.schema(epochCol).dataType),
      s"$epochCol must be integral (got ${df.schema(epochCol).dataType}); " +
        "derive epochs explicitly (e.g. floor(unix_timestamp/86400).cast(long))")
    df.groupBy(col(keyCol), col(epochCol).cast(LongType).as("e"))
      .agg(count(lit(1)).as("s"))
  }

  def decayedSeries(df: DataFrame, keyCol: String, epochCol: String): DataFrame = {
    val counts = epochCounts(df, keyCol, epochCol)
    val zero = struct(
      array().cast("array<struct<e:bigint,s:bigint>>").as("out"),
      lit(Long.MinValue).as("pe"), lit(0L).as("sc"))
    val series = counts.groupBy(col(keyCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("e"), col("s")))),
        zero,
        (acc, x) => {
          // same lazy sentinel guard as decayedByKey (ANSI overflow)
          val ns = when(acc.getField("pe") === Long.MinValue, lit(0L))
            .otherwise(decay(acc.getField("sc"),
              x.getField("e") - acc.getField("pe"))) + x.getField("s")
          struct(
            concat(acc.getField("out"),
              array(struct(x.getField("e").as("e"), ns.as("s")))).as("out"),
            x.getField("e").as("pe"), ns.as("sc"))
        },
        acc => acc.getField("out")).as("__series"))
    series.select(col(keyCol), explode(col("__series")).as("__x"))
      .select(col(keyCol), col("__x.e").as("epoch"), col("__x.s").as("score"))
  }

  /**
   * The SERVING read of a decayed-score log: current top-k at a horizon.
   * `scores` is any `(keyCol, epoch, score)` table — [[decayedSeries]]
   * output, or the log the `--trending` app mode appends (multiple rows
   * per key; the newest ≤ horizon wins by max-struct, future rows are
   * excluded first). Each key's score is aged to the horizon by the
   * fold's own step (right-shifts, hard zero from 63), then ranked with
   * a bytewise key tie-break.
   *
   * 100 TB shape: one partial-agg exchange to the per-key newest row,
   * then `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
   * (per-partition heaps merged at the driver), never a global sort.
   */
  def topAtHorizon(scores: DataFrame, keyCol: String, horizon: Long,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    scores.where(col("epoch") <= horizon)
      .groupBy(col(keyCol))
      .agg(max(struct(col("epoch"), col("score"))).as("__l"))
      .select(col(keyCol), col("__l.epoch").as("last_epoch"),
        decay(col("__l.score"), lit(horizon) - col("__l.epoch")).as("score_now"))
      .orderBy(col("score_now").desc, col(keyCol))
      .limit(k)
  }
}
