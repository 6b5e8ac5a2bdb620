package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column.
 *
 * Reference analog: the DRPC kNN matcher `PartialMatcher`
 * (`stormcv-examples/.../drpc/PartialMatcher.java:51-271`), where each
 * task holds a shard of prototype vectors and queries are replicated to
 * all shards (`allGrouping`, `E8_DRPCTopology.java:67`). The Spark-first
 * transposition is a **broadcast nested-loop scoring pass**: the small
 * query set is broadcast, the corpus stays partitioned, and per-partition
 * top-k is reduced before the final global top-k — the same
 * shard-then-merge shape, but planned by Catalyst.
 *
 * Scores are quantized (see [[VectorOps]]), so ranking is total and
 * reproducible: ORDER BY score DESC, corpus id ASC.
 */
object Similarity {

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /**
   * Brute-force cosine top-k: every query × every corpus row, ranked by
   * the deterministic quantized cosine. Output:
   * (query_id, corpus_id, cos_q_e6, rk).
   *
   * The `broadcast(queries)` hint makes this a BroadcastNestedLoopJoin —
   * no shuffle of the (huge) corpus; each executor scores its partitions
   * against the in-memory query block, then a single shuffle on query_id
   * reduces per-partition candidates to the global top-k.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idQ: String, idC: String, vecQ: String, vecC: String, k: Int): DataFrame = {
    val q = queries.select(col(idQ).as("query_id"), col(vecQ).as("qv"),
      VectorOps.norm_q(col(vecQ)).as("qn"))
    val c = corpus.select(col(idC).as("corpus_id"), col(vecC).as("cv"),
      VectorOps.norm_q(col(vecC)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .select($"query_id", $"corpus_id",
        floor(VectorOps.cosineScore(VectorOps.dot_q($"qv", $"cv"), $"qn", $"cn") * 1e6)
          .cast(LongType).as("cos_q"))
    // bounded-heap partial top-k (TopK aggregator): only ≤ k rows per
    // (partition, query) cross the shuffle — not the |Q|·|C| cross product
    TopK.perKey(scored, "query_id", "corpus_id", "cos_q", k, "corpus_id", "cos_q")
  }

  /**
   * LSH-bucketed ANN (the scale path): corpus is pre-bucketed by sign
   * random projections; a query only scores rows in its own bucket (plus
   * all buckets at hamming distance ≤ 1 for recall). Bucketing turns the
   * O(|Q|·|C|) scan into an equi-join — the 100 TB-shape plan.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idQ: String, idC: String, vecQ: String, vecC: String,
      k: Int, nPlanes: Int = 12, probeNeighbors: Boolean = true): DataFrame = {
    val c = corpus.select(col(idC).as("corpus_id"), col(vecC).as("cv"),
      VectorOps.norm_q(col(vecC)).as("cn"),
      VectorOps.lsh_bucket(col(vecC), nPlanes).as("bucket"))
    val q0 = queries.select(col(idQ).as("query_id"), col(vecQ).as("qv"),
      VectorOps.norm_q(col(vecQ)).as("qn"),
      VectorOps.lsh_bucket(col(vecQ), nPlanes).as("qb"))
    // multi-probe: query's own bucket + all single-bit flips
    val probes =
      if (!probeNeighbors) q0.withColumn("bucket", $"qb")
      else q0.select($"query_id", $"qv", $"qn",
        explode(array((-1 until nPlanes).map {
          case -1 => $"qb"
          case b  => $"qb".bitwiseXOR(lit(1L << b))
        }: _*)).as("bucket"))
    val scored = probes.join(c, Seq("bucket"))
      .select($"query_id", $"corpus_id",
        floor(VectorOps.cosineScore(VectorOps.dot_q($"qv", $"cv"), $"qn", $"cn") * 1e6)
          .cast(LongType).as("cos_q"))
      .groupBy($"query_id", $"corpus_id").agg(max($"cos_q").as("cos_q")) // dedup multi-probe hits
    TopK.perKey(scored, "query_id", "corpus_id", "cos_q", k, "corpus_id", "cos_q")
  }

  /** Per-label quantized centroid sums: (label, pos, sum_q, n). Exact. */
  def centroidSums(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .withColumn("pos", $"pos".cast(LongType))
      .groupBy($"label", $"pos")
      .agg(sum(floor($"v".cast(DoubleType) * 1e6).cast(LongType)).as("sum_q"),
        count(lit(1)).as("n"))
}
