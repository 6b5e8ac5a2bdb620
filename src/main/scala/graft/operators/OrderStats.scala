package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * EXACT distributed order statistics — the exact twin of
 * [[Sketches.approxTokenQuantiles]] (Greenwald-Khanna), for the places a
 * corpus-QA readout must be digit-reproducible (gate thresholds, release
 * dashboards, regression diffs between crawls): an approximate median
 * that drifts with `accuracy` cannot anchor a "did the length
 * distribution shift" alarm. Reference analog: the reference computes
 * its per-window feature statistics exactly inside `IBatchOperation`
 * implementations (`operation/IBatchOperation.java:15-24` — batch ops
 * see the full window, never a sample) — this is that exactness kept
 * at corpus scale.
 *
 * The naive exact plan is a global (or per-group) SORT of every row —
 * the one physical shape this engine never ships. The scalable exact
 * construction is the DISTINCT-VALUE HISTOGRAM:
 *
 *   1. `groupBy(group, value).count()` — ONE hash exchange whose row
 *      count is the number of distinct `(group, value)` pairs, not the
 *      row count. For discrete corpus measures (token counts, char
 *      lengths, scores in per-mille) that is bounded by the value
 *      domain per group (thousands), independent of corpus size; the
 *      partial (map-side) count does the 10^12 → 10^3 collapse before
 *      anything moves.
 *   2. Two windows over the SAME `partitionBy(group)` (one exchange,
 *      one in-partition sort of the tiny histogram): running count and
 *      group total.
 *   3. The rank-k selection `cum >= ceil(q·n/1000)` is evaluated as
 *      `1000·cum >= q·n` — pure integer arithmetic, no floats anywhere,
 *      so the result is exact and engine-portable (the q109 oracle
 *      rebuilds it in DuckDB from `row_number()` over raw rows — an
 *      independent construction of the same statistic).
 *
 * Semantics: type-1 (discontinuous) quantiles over the multiset — the
 * returned value is an ELEMENT of the data, the one at 1-based sorted
 * position `ceil(q_pm·n/1000)`; `q_pm = 1000` is the maximum, an even-n
 * median (`q_pm = 500`) is the LOWER middle element. NULL values are
 * excluded from the multiset (and `n`) up front, matching SQL aggregate
 * convention.
 *
 * Worst case: a continuous value column (every value distinct) degrades
 * the histogram to one row per input row — still one hash exchange plus
 * in-partition sorts, never a single global range sort, but the window
 * partition for a single group is then unbounded; quantize continuous
 * measures (per-mille scores) before calling, which is what every
 * caller in this engine does anyway.
 */
object OrderStats {

  /**
   * Exact per-group quantiles of an integral column at the given
   * per-mille ranks. Output: `(groupCol, q_pm, value)` — one row per
   * (group, requested rank), `value` typed LONG.
   */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
      qsPerMille: Seq[Int]): DataFrame = {
    require(qsPerMille.nonEmpty, "qsPerMille must be non-empty")
    require(qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille ranks must be in [1, 1000]: $qsPerMille")
    require(qsPerMille.distinct.size == qsPerMille.size,
      s"duplicate ranks would duplicate output rows: $qsPerMille")
    val sp = df.sparkSession
    import sp.implicits._

    val hist = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast(LongType).as(valueCol))
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__cnt"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("__cum", sum($"__cnt").over(byGroup.orderBy(col(valueCol))))
      .withColumn("__n", sum($"__cnt").over(byGroup))
    // rank-k membership: cum >= ceil(q·n/1000)  ⇔  1000·cum >= q·n for
    // integral cum (safe to 9·10^15 rows per group before long overflow)
    cum.crossJoin(broadcast(qsPerMille.toDF("q_pm")))
      .where($"__cum" * 1000 >= $"q_pm".cast(LongType) * $"__n")
      .groupBy(col(groupCol), $"q_pm")
      .agg(min(col(valueCol)).as("value"))
  }
}
