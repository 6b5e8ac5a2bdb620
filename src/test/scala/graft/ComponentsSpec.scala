package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Sampling}

/** Dup-cluster assignment (connected components over a candidate-pair
  * graph) and the deterministic shard export — round-4 additions. */
class ComponentsSpec extends SparkSpec {

  // chain 1-2-3, clique {10,11,12}, pair {20,21}; 3 components
  private def pairGraph = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
  }

  test("components: chain, clique, pair all labeled by their min id") {
    import spark.implicits._
    val got = Components.connectedComponents(pairGraph)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want, got.toString)
  }

  test("components: long chain needs diameter rounds, still converges") {
    import spark.implicits._
    // path 0-1-2-...-19 given in worst-case orientation (high id first)
    val chain = (0L until 19L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(chain).as[(Long, Long)].collect()
    assert(got.length == 20 && got.forall(_._2 == 0L), got.toSeq.toString)
  }

  test("components: result invariant under partitioning and edge order") {
    import spark.implicits._
    val base = Components.connectedComponents(pairGraph).as[(Long, Long)]
      .collect().sorted.toSeq
    val shuffled = Components.connectedComponents(
        pairGraph.orderBy(rand(7)).repartition(13))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(base == shuffled)
  }

  test("components: empty pair set yields empty labeling") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponents(e).isEmpty)
  }

  test("components: durable-checkpoint path matches and resumes bit-identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val a = Components.connectedComponents(pairGraph, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().sorted.toSeq
    val local = Components.connectedComponents(pairGraph)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == local)
    // rerun against the same dir: completed rounds are reused verbatim
    val b = Components.connectedComponents(pairGraph, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(b == a)
  }

  test("components: maxIters too small fails loudly, not silently wrong") {
    import spark.implicits._
    val chain = (0L until 19L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("shardAssign: positions dense per shard, assignment is a pure id function") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val a = Sampling.shardAssign(ids, "doc_id", 8)
    // every shard's positions are exactly 1..count(shard)
    val bad = a.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"),
        countDistinct($"pos").as("d"))
      .where($"mx" =!= $"n" || $"mn" =!= 1 || $"d" =!= $"n")
    assert(bad.isEmpty)
    // reruns at different parallelism/input order are bit-identical
    val b = Sampling.shardAssign(ids.orderBy(rand(3)).repartition(17), "doc_id", 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // all shards populated (hash-balanced) and assignment within range
    assert(a.select(countDistinct($"shard")).as[Long].head() == 8L)
  }
}
