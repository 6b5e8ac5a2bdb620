package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate variants of the exact rollups — the operators
 * a 100 TB run reaches for when the exact form's shuffle is the
 * bottleneck (SURVEY.md §2's "novel sketch" extension category):
 *
 *  - exact `countDistinct` shuffles every distinct value to its key's
 *    reducer (two-phase distinct agg — q19's plan); the HLL++ sketch
 *    ships a fixed few-KB register array per (partition, key) instead,
 *    with relative error `rsd`. At 10^12 fingerprints this is the
 *    difference between shuffling terabytes and megabytes.
 *  - exact percentiles need a sort or full collection per key;
 *    `percentile_approx` (Greenwald-Khanna) merges bounded summaries.
 *
 * Both are algebraic (merge-associative) Spark built-ins, so they get
 * map-side partial aggregation and stay deterministic for a fixed input
 * set and partitioning-independent (HLL registers merge by max; GK
 * summaries by documented rank-error bound). Accuracy vs the exact
 * operators is spec-asserted (SketchSpec), not oracle-hashed — DuckDB's
 * sketches are different implementations by design.
 */
object Sketches {

  /** Approximate distinct normalized-content fingerprints per group —
    * the HLL twin of the exact q19 rollup. */
  def approxDistinctFingerprints(df: DataFrame, groupCol: String,
      textCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(TextAnalysis.fingerprint(col(textCol)), rsd)
        .as("n_fp_approx"),
        count(lit(1)).as("docs"))

  /** Approximate token-count percentiles per group (accuracy = 1/err). */
  def approxTokenQuantiles(df: DataFrame, groupCol: String, textCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame =
    df.select(col(groupCol), TextAnalysis.tokenCount(col(textCol)).as("toks"))
      .groupBy(col(groupCol))
      .agg(percentile_approx(col("toks"),
        array(probabilities.map(lit): _*), lit(accuracy)).as("tok_quantiles"))

  /**
   * Approximate frequent terms — the sketch twin of the exact term
   * histogram (q37). `DataFrameStatFunctions.freqItems` (Karp-
   * Papadimitriou-Shenker): single pass, bounded memory, and the
   * documented one-sided guarantee that EVERY term whose count exceeds
   * a `support` FRACTION of all rows (count > support·N) is returned
   * (false positives possible, false negatives not) — at 100 TB this replaces the exact histogram's full
   * (term → count) shuffle with a fixed-size summary per partition.
   * Result order is partitioning-dependent (unlike everything else in
   * this engine); treat the output as a SET — spec-asserted superset
   * property, deliberately no oracle.
   */
  def frequentTerms(df: DataFrame, textCol: String, support: Double): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .stat.freqItems(Seq("term"), support)
}
