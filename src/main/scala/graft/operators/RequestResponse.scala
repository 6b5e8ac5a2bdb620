package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Request/response query service — the Spark transposition of the
 * reference's DRPC plane (SURVEY.md §3.3): `RequestBolt` →
 * `FeatureExtractionOp` → allGrouping `PartialMatcher` shards →
 * `BatchBolt` per-request aggregation
 * (`stormcv-examples/.../drpc/E8_DRPCTopology.java:60-70`,
 * `drpc/PartialMatcher.java:51-271`, `drpc/BatchBolt.java:63-99`).
 *
 * Where Storm replicated every query to all matcher tasks holding corpus
 * shards, Spark **broadcasts the (small) request batch** and scans the
 * (large, partitioned) corpus once — the identical shard-and-merge
 * dataflow, planned as a BroadcastNestedLoopJoin + per-request top-k.
 * `request_id` threads through every row like `CVParticle.requestId`
 * (`model/CVParticle.java:27`).
 */
object RequestResponse {

  /**
   * Text match service: for each (request_id, query_text), return the
   * top-k most similar corpus docs by word-shingle containment score
   * (quantized: floor(1000·|Q∩D|/|Q|), ties by doc id).
   */
  def matchText(spark: SparkSession, requests: DataFrame, corpus: DataFrame,
      reqId: String, reqText: String, docId: String, docText: String,
      k: Int = 5, n: Int = 2): DataFrame = {
    val qSh = Dedup.shingles(
      requests.select(col(reqId).as("request_id"), col(reqText).as("text")),
      "request_id", "text", n)
    val qSize = qSh.groupBy(col("request_id")).agg(count(lit(1)).as("q_sz"))
    val dSh = Dedup.shingles(
      corpus.select(col(docId).as("doc_id"), col(docText).as("text")),
      "doc_id", "text", n)
    // the request side is tiny: broadcast it to every corpus partition
    val hits = dSh.join(broadcast(qSh), Seq("shingle"))
      .groupBy(col("request_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = hits.join(broadcast(qSize), Seq("request_id"))
      .select(col("request_id"), col("doc_id"),
        floor(lit(1000) * col("inter") / col("q_sz")).cast(LongType).as("score_q"))
    // per-request barrier agg (BatchBolt analog): bounded partial top-k
    TopK.perKey(scored, "request_id", "doc_id", "score_q", k, "doc_id", "score_q")
  }

  /**
   * Embedding match service (PartialMatcher's descriptor-space kNN):
   * requests broadcast, corpus scanned, quantized-cosine top-k per
   * request — delegates to [[Similarity.bruteForceTopK]].
   */
  def matchEmbedding(requests: DataFrame, corpus: DataFrame,
      reqId: String, reqVec: String, docId: String, docVec: String,
      k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(requests, corpus, reqId, docId, reqVec, docVec, k)
      .withColumnRenamed("query_id", "request_id")
}
