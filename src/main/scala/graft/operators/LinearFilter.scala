package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Trained linear quality filter — the fastText-style classifier gate
 * (CCNet / LLaMA-pipeline convention: train a cheap linear model on
 * hashed text features, gate the corpus by its score). Training is the
 * BATCH INTEGER PERCEPTRON, chosen deliberately over logistic
 * regression: every quantity is exact 64-bit integer arithmetic
 * (features are [[TextAnalysis.hashedTfVector]] counts, margins are
 * integer dots, updates are integer sums), so the learned weights are
 * BIT-IDENTICAL across engines, partitionings, and cluster sizes — the
 * same reason [[LanguageModel]] quantizes likelihoods and avoids logs.
 * A sigmoid/float-gradient trainer cannot make that promise, and the
 * whole registry's value-checking discipline rests on it.
 *
 * Batch (not online) updates make the epoch order-free: one pass
 * computes every row's margin against the FROZEN previous-epoch
 * weights, and the update is the SUM of `y·x` over misclassified rows
 * (`y·margin ≤ 0`) — long addition is associative and commutative, so
 * the result is independent of row order and partitioning
 * (spec-asserted). Convergence: the classic perceptron bound applies
 * per epoch-batch; separable specs converge in a handful of epochs.
 *
 * 100 TB shape: each epoch is ONE aggregation over the corpus — the
 * margin filter and `y·x` scaling are row-local projections, and
 * [[LongVecSum]] reduces each partition to a single `dim`-long buffer
 * map-side (the [[VecSumQ]] k-means pattern), so the exchange carries
 * one array row per partition. The per-epoch 1-row collect is the
 * model-artifact step every trainer pays ([[Bpe.learn]],
 * [[Components.connectedComponents]]). Scoring rides a row-local HOF
 * (dim is small, 16–64); the codegen-expression escalation
 * ([[PqAdcScore]]'s shape) is documented, not built.
 */
object LinearFilter {

  /** Integer margin `dot(w, x)` of a feature column against frozen
    * weights (a tiny model literal baked into the plan). */
  def margin(x: Column, w: Array[Long]): Column =
    aggregate(
      zip_with(typedlit(w.toSeq), x, (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)

  /**
   * Train `epochs` batch-perceptron epochs from zero weights over
   * `(featCol: array<bigint> of length dim, labelCol: ±1)`. Returns the
   * learned weight vector. An epoch with no misclassified rows is a
   * fixed point — training stops early (identical weights to running
   * the remaining epochs, which would all add zero).
   */
  def train(df: DataFrame, featCol: String, labelCol: String,
      dim: Int, epochs: Int): Array[Long] = {
    require(dim >= 1, "dim must be >= 1")
    require(epochs >= 1, "epochs must be >= 1")
    // a ragged row would otherwise vanish SILENTLY: zip_with pads the
    // short side with nulls, the null margin fails the filter, and the
    // row simply never votes — fail loudly instead (one early-exit scan)
    require(df.where(size(col(featCol)) =!= dim).isEmpty,
      s"feature column $featCol must be uniformly $dim wide")
    val sum = udaf(LongVecSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    var w = new Array[Long](dim)
    var e = 0
    var converged = false
    while (e < epochs && !converged) {
      val upd = df
        .select(col(labelCol).cast(LongType).as("__y"), col(featCol).as("__x"))
        .where(col("__y") * margin(col("__x"), w) <= 0L)
        .select(transform(col("__x"), v => v * col("__y")).as("__yx"))
        .agg(sum(col("__yx")).as("__u"))
        .collect()(0).getSeq[Long](0)
      if (upd.isEmpty) converged = true // zero-width = no misclassified rows
      else {
        require(upd.length == dim,
          s"feature width ${upd.length} != dim $dim")
        w = w.zip(upd).map { case (a, b) => a + b }
      }
      e += 1
    }
    w
  }

  /** Corpus scoring: input plus an integer `score` column (the gate
    * thresholds on it; sign = predicted class). */
  def score(df: DataFrame, featCol: String, w: Array[Long]): DataFrame =
    df.withColumn("score", margin(col(featCol), w))

  /** The weight vector as a persistable model table `(i, w)` (1-based
    * index) — what a training job writes and every gate job loads. */
  def weightsDf(spark: org.apache.spark.sql.SparkSession,
      w: Array[Long]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }
      .toDF("i", "w")
  }

  /** Load a persisted weight table (model-sized collect, like
    * [[Bpe.mergesFrom]]); indices must be dense 1..n — a gapped or
    * duplicated table means the artifact is corrupt, fail loudly. */
  def weightsFrom(df: DataFrame): Array[Long] = {
    val rows = df.select(col("i").cast(LongType), col("w").cast(LongType))
      .orderBy(col("i").asc).collect()
    require(rows.nonEmpty, "weight table is empty")
    require(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      s"weight table indices must be dense 1..${rows.length}; got " +
        rows.map(_.getLong(0)).mkString(","))
    rows.map(_.getLong(1))
  }
}

/**
 * Exact element-wise sum of `array<bigint>` vectors as one typed
 * Aggregator — [[VecSumQ]]'s shape without the float quantization
 * (inputs are already exact integers). Width locks to the first vector;
 * ragged inputs fail loudly. Null rows contribute nothing.
 */
object LongVecSum extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
    if (a == null) return b
    val buf = if (b.length == 0) new Array[Long](a.length) else b
    require(a.length == buf.length,
      s"long_vec_sum: ragged vector (length ${a.length}, expected ${buf.length})")
    var i = 0
    while (i < buf.length) { buf(i) += a(i); i += 1 }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    require(x.length == y.length,
      s"long_vec_sum: ragged merge (${x.length} vs ${y.length})")
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
