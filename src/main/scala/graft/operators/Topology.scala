package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dataflow-shape operators completing the reference's topology plane
 * (SURVEY.md §2): fan-out with key refinement (tiling), fan-in
 * recombination, and grouped batching.
 *
 *  - `TilingOp` (`operation/TilingOp.java:64-87`) split a frame into
 *    rows×cols tiles and rewrote `streamId` to `id_tileIdx`; [[sections]]
 *    splits a page's text into fixed-count sections with a derived
 *    `(key, section_idx)` — an `explode`, not a custom partitioner.
 *  - `TileGrouping`+`TilesRecombinerOp`
 *    (`grouping/TileGrouping.java:48-60`,
 *    `operation/TilesRecombinerOp.java:72-167`) routed tiles back to the
 *    original key and merged them; [[recombine]] is the partial+final
 *    aggregation Spark gives natively: groupBy original key, order by
 *    section index, reassemble.
 *  - `FrameGrouperOp`/`GroupOfFrames` (`operation/FrameGrouperOp.java:22-53`,
 *    `model/GroupOfFrames.java:14-21`) packed N tuples into one;
 *    [[groupN]] is `collect_list` over an N-bucketed count window.
 */
object Topology {

  /**
   * Fan-out: split `textCol` into `nSections` near-equal sections.
   * Output: original key cols + (section_idx, section_text).
   */
  def sections(df: DataFrame, textCol: String, nSections: Int): DataFrame = {
    val len = length(col(textCol))
    val idx = explode(sequence(lit(0), lit(nSections - 1)))
    df.withColumn("section_idx", idx)
      .withColumn("section_text",
        // substring bounds derived per section; 1-based substr
        expr(s"substring($textCol, cast(section_idx * length($textCol) / $nSections as int) + 1, " +
          s"cast((section_idx + 1) * length($textCol) / $nSections as int) - " +
          s"cast(section_idx * length($textCol) / $nSections as int))"))
  }

  /**
   * Fan-in: reassemble sections per key in section order — equivalent to
   * the reference's tile recombination (a groupBy-and-merge, not a join).
   */
  def recombine(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("section_idx"), col("section_text")))),
        s => s.getField("section_text")), "").as("recombined_text"),
        count(lit(1)).as("n_sections"))

  /**
   * GroupOfFrames analog: pack each key's rows into batches of `n` in
   * `orderCol` order (batch id = row_number / n), one array per batch.
   */
  def groupN(df: DataFrame, keyCol: String, orderCol: String, payload: Column,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w) - 1)
      .withColumn("_batch", (col("_rn") / n).cast(IntegerType))
      .groupBy(col(keyCol), col("_batch").as("batch_id"))
      .agg(collect_list(payload).as("group"), count(lit(1)).as("n_rows"))
  }
}
