package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * Ingest-time deduplication for the page stream — the streaming form of
 * the batch dedup family ([[graft.operators.Dedup]]): the first page per
 * content fingerprint survives; later copies arriving within the
 * watermark horizon are dropped, and the fingerprint state itself is
 * evicted once the watermark passes (bounded state — the property the
 * reference's TTL-bound history cache approximated wall-clock-wise,
 * `batcher/SlidingWindowBatcher.java:24-74`).
 *
 * Built on `dropDuplicatesWithinWatermark`, which keeps one state-store
 * entry per distinct fingerprint inside the horizon — state size is
 * O(distinct content in horizon), independent of stream length. This is
 * the #1 pre-training ingest op: dedup before anything downstream pays
 * for the duplicate bytes.
 */
object StreamDedup {

  /**
   * Drop re-crawled/duplicate pages by normalized content fingerprint
   * ([[TextAnalysis.fingerprint]]: lowercase, strip non-alphanumerics,
   * md5 — layout-invariant identity).
   *
   * @param tsCol event-time column the watermark rides on
   * @param delay watermark delay; also the dedup horizon: duplicates
   *              farther apart in event time than this may BOTH survive
   *              (the documented `dropDuplicatesWithinWatermark` contract
   *              — at 100 TB/day an unbounded-horizon dedup would hold
   *              unbounded state; run the batch `Dedup.exactDups`
   *              compaction over committed epochs for the long tail)
   */
  def byFingerprint(pages: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    pages
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
