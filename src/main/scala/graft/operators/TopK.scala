package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Bounded-buffer top-k as a typed `Aggregator` — the engine's custom-UDAF
 * extension point (SURVEY.md §2.9: `IBatchOperation` / DRPC
 * `IBatchOp`+`IResultOp` → `Aggregator[IN,BUF,OUT]` via `functions.udaf`;
 * reference `drpc/BatchBolt.java:63-99` accumulates per-request results
 * the same way, with the buffer living in bolt state).
 *
 * Why an Aggregator instead of a `row_number()` window: a window must
 * first shuffle EVERY scored row to its key's partition before ranking —
 * for top-k over |Q|·|C| similarity scores that is the whole cross
 * product through one exchange. A typed Aggregator gets Spark's two-phase
 * aggregation (ObjectHashAggregate): each input partition reduces to ≤ k
 * rows per key map-side, and only those partial top-k buffers cross the
 * shuffle. Same result (the score ordering is total), 1/|partition-size|
 * the exchanged rows.
 *
 * Ordering is the engine's deterministic ranking contract: score DESC,
 * then id ASC (quantized integer scores make this total — see
 * [[VectorOps]]).
 */
object TopK {

  /** One scored candidate. */
  final case class Scored(id: Long, score: Long)

  /** Total order: higher score first, ties by lower id. */
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Top-k aggregator with a 2k-bounded buffer (amortized O(log k)/row). */
  final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")
    override def zero: Seq[Scored] = Vector.empty
    private def compact(buf: Seq[Scored]): Seq[Scored] = buf.sortWith(better).take(k)
    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
      val b = buf :+ in
      if (b.size >= 2 * k) compact(b) else b
    }
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = compact(a ++ b)
    override def finish(buf: Seq[Scored]): Seq[Scored] = compact(buf)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** The udaf form: `topKUdaf(k)(idCol, scoreCol)` → `array<struct<id,score>>`. */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]())

  /**
   * Per-key top-k: groupBy(key) + partial-aggregating top-k, exploded to
   * `(key, outId, outScore, rk)` rows with rk = 1..k (bigint).
   */
  def perKey(scored: DataFrame, keyCol: String, idCol: String, scoreCol: String,
      k: Int, outId: String, outScore: String): DataFrame =
    scored.groupBy(col(keyCol))
      .agg(topKUdaf(k)(col(idCol), col(scoreCol)).as("_top"))
      .select(col(keyCol), posexplode(col("_top")))
      .select(col(keyCol), col("col.id").as(outId), col("col.score").as(outScore),
        (col("pos") + 1).cast(LongType).as("rk"))

  /** Register the k-bound SQL form: `top_k_<k>(id, score)`. */
  def registerSql(spark: SparkSession, k: Int): Unit =
    spark.udf.register(s"top_k_$k", topKUdaf(k))
}
