package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Connected components over a candidate-pair graph — the missing last
 * step of every near-duplicate pipeline: pair finders ([[Dedup]]'s
 * MinHash-LSH / SimHash / embedding-LSH) emit *edges*; deduplication at
 * corpus scale needs *cluster ids* (keep one doc per component, not one
 * per pair — pairwise keeper-picking over chains A-B, B-C keeps A and
 * drops both B and C even though A~C was never verified; component
 * labeling keeps exactly one per transitive group).
 *
 * Reference analog: StormCV's `FeatureMatcherTopology` stops at pairwise
 * match results (`FeatureMatchResultOp.java`) — the transitive grouping
 * a dedup pipeline needs on top is exactly this operator.
 *
 * Algorithm: iterative min-label propagation to the fixpoint (each node
 * takes the min label over itself and its neighbors; identical to what
 * GraphX's `connectedComponents` Pregel program computes). Rounds needed
 * = graph diameter; near-duplicate graphs are dense low-diameter blobs
 * (components are cliques-with-holes around a shared template), so this
 * converges in a handful of rounds — the per-round cost is ONE hash
 * equi-join of the edge list against the (node-sized) label table plus
 * one min-aggregation, nothing quadratic, nothing driver-side but the
 * convergence counter (a 1-row aggregate per round, same shape as any
 * Lloyd/Pregel step). For adversarially long chain graphs (diameter
 * ≫ log n — not a near-dup shape) the escalation is the alternating
 * large-star/small-star rewriting of Kiveris et al. (MR'14), which
 * squares the convergence rate at the price of rewriting the edge list
 * per round; not needed for the dedup workload this engine targets.
 *
 * Determinism: the label lattice (min over a fixed id set) has one
 * fixpoint regardless of iteration order or partitioning, so results are
 * bit-identical at any parallelism — spec-asserted, and oracle-checked
 * end-to-end against a recursive-CTE transitive closure in DuckDB (q57).
 *
 * Failure tolerance mirrors [[Similarity.refineCentroids]]: per-round
 * label tables are pinned with `localCheckpoint` (fast, lost on executor
 * failure) or, given `checkpointDir`, a durable parquet round-trip whose
 * completed rounds (`_SUCCESS`) are reused verbatim on rerun.
 */
object Components {

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Pin an iteration artifact: executor-local blocks by default, or a
    * durable parquet round-trip under `checkpointDir/name` (resumable —
    * an existing `_SUCCESS` is reused as-is; every artifact here is
    * deterministic, so reuse is bit-exact). */
  private def mat(df: DataFrame, checkpointDir: Option[String], name: String): DataFrame =
    checkpointDir match {
      case None => df.localCheckpoint()
      case Some(dir) =>
        val spark = df.sparkSession
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
        val f = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (!f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(p.toString)
        spark.read.parquet(p.toString)
    }

  /**
   * Component labels for every node of the undirected graph given as a
   * pair list: returns `(id, cluster_id)` with `cluster_id` = the min
   * node id in the component (any id type with a total order). Nodes are
   * exactly the ids appearing in `pairs`; isolated docs (no candidate
   * pair) are their own trivial component and are deliberately NOT
   * materialized — at corpus scale the pair graph is a sliver of the
   * corpus and the output should be too (left-join it back and coalesce
   * to own id for a full-corpus labeling).
   *
   * Scale shape per round: `edges ⋈ labels` is a hash equi-join on the
   * node id — edge list shuffled on src, label table shuffled on id,
   * then one partial-aggregated min per node. The edge list is pinned
   * once (localCheckpoint / parquet) and re-shuffled per round; labels
   * shrink to one row per node immediately. Nothing driver-side except
   * the empty-check that detects the fixpoint.
   */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", checkpointDir: Option[String] = None,
      maxIters: Int = 50): DataFrame = {
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val sym = fwd.union(fwd.select($"dst".as("src"), $"src".as("dst")))
    // No `.distinct()` before the pin: min-label propagation is
    // idempotent over duplicate edges (the min over a multiset equals
    // the min over its support), every pair finder in
    // [[graft.operators.Dedup]] already emits distinct pairs, and the
    // dedup exchange would double the build cost for nothing. (No
    // repartition either: a localCheckpoint scan comes back as an
    // ExistingRDD with real size stats but NO partitioning, so a
    // pre-pin exchange buys nothing — measured, and visible in the
    // plan. The stats are what matter: node-sized label tables
    // broadcast in the per-round join once AQE sees their true size.)
    val edges = mat(sym, checkpointDir, "edges")
    val idType = pairs.schema(idA).dataType
    // labels-0 already carries ROUND 1: cluster = min(own id, neighbors)
    // folds into the same exchange that used to build the identity
    // labeling (the distinct() on src), so the first propagation round
    // costs nothing extra — one materialized table and one aggregation
    // replace the old identity-labels + full first loop round
    var pinned = mat(
      edges.groupBy($"src")
        .agg(least(min($"dst"), min($"src")).as("cluster_id"))
        .select($"src".as("id"), $"cluster_id"),
      checkpointDir, "labels-0")
    var labels = pinned
    var it = 0
    var done = labels.isEmpty // empty graph: nothing to propagate
    while (!done && it < maxIters) {
      it += 1
      // the convergence flag rides the SAME aggregation that computes the
      // round (guide §2.4: two ops keyed the same way share one exchange):
      // label rows carry their own cluster_id as __prev, propagated rows
      // carry NULL, so min(__prev) per id is exactly the previous label
      // (every propagated id has a label row — edges are symmetric) and
      // __chg marks ids whose label moved. The fixpoint test is then a
      // scan of the already-materialized round — the previous per-round
      // join + isEmpty action (2 exchanges + an extra job) is gone.
      val prop = edges
        .join(labels.select($"id".as("src"), $"cluster_id"), "src")
        .select($"dst".as("id"), $"cluster_id",
          lit(null).cast(idType).as("__prev"))
      val next = mat(
        labels.select($"id", $"cluster_id", $"cluster_id".as("__prev"))
          .union(prop)
          .groupBy($"id").agg(min($"cluster_id").as("cluster_id"),
            min($"__prev").as("__prev"))
          .select($"id", $"cluster_id",
            ($"cluster_id" =!= $"__prev").as("__chg")),
        checkpointDir, s"labels-$it")
      // min-propagation is monotone, so the fixpoint test is exact:
      // unchanged round => unchanged forever
      done = next.where($"__chg").isEmpty
      pinned.unpersist()
      pinned = next
      labels = next.select($"id", $"cluster_id")
    }
    require(done, s"connectedComponents did not converge in $maxIters rounds — " +
      "graph diameter exceeds the near-dup shape this operator targets; " +
      "raise maxIters or switch to a star-contraction variant")
    edges.unpersist()
    labels
  }

  /**
   * Incremental component maintenance — the 100 TB shape, pairing with
   * [[graft.streaming.IndexMaintenance]]: as corpus epochs append, the
   * pair finder emits only NEW candidate pairs (e.g.
   * [[Dedup.incrementalNearDupKeepers]]'s probe of the persisted band
   * index); cluster labels are then caught up from the previous labeling
   * plus the new edges alone, never re-propagating over the historical
   * edge list.
   *
   * Correctness: a labeling is a contraction of its graph that preserves
   * both connectivity and the component-min (each node's label IS the min
   * of its component), so running [[connectedComponents]] over
   * `{(id, prev_label)} ∪ newPairs` yields exactly the labels of the full
   * union graph — including transitive merges where one new edge fuses
   * two old clusters (the fused cluster takes the global min) —
   * spec-asserted chunked ≡ batch. Cost: the star edges are one row per
   * previously-clustered node (not per historical pair), and rounds
   * restart from a graph whose old regions have diameter 1.
   */
  def ccIncrement(prevLabels: DataFrame, newPairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b",
      checkpointDir: Option[String] = None, maxIters: Int = 50): DataFrame = {
    val star = prevLabels.select(col("id").as(idA), col("cluster_id").as(idB))
    connectedComponents(star.unionByName(newPairs.select(col(idA), col(idB))),
      idA, idB, checkpointDir, maxIters)
  }

  /**
   * One keeper per cluster — the selection step between a labeling and a
   * corpus rewrite. Default: the min id (== `cluster_id` itself for
   * labelings this object produces, but computed, so labels from any
   * source work). With `scores` (an `(id, score)` table, higher = keep):
   * the highest-scoring member, ties broken by min id — fully
   * deterministic either way, so incremental label maintenance
   * ([[ccIncrement]]) followed by keeper selection equals batch
   * (spec-asserted). Members ABSENT from `scores` rank below every
   * scored member (LEFT join, nulls last), and a cluster with no scored
   * member at all falls back to the min-id keeper — the one-keeper-per-
   * cluster contract holds for every cluster, never silently dropping
   * one (which would delete every copy of its content downstream).
   *
   * Returns `(cluster_id, keeper)`. Scale: labels are pair-graph-sized
   * (a sliver of the corpus); min-id keepers are one partial-aggregated
   * groupBy, score-ranked keepers one shuffle on cluster_id + an
   * in-partition top-1.
   */
  def keeperPerCluster(labels: DataFrame,
      scores: Option[DataFrame] = None): DataFrame = scores match {
    case None =>
      labels.groupBy($"cluster_id").agg(min($"id").as("keeper"))
    case Some(sc) =>
      val scored = labels.join(
        sc.select($"id", $"score"), Seq("id"), "left")
      scored
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"cluster_id")
            .orderBy($"score".desc_nulls_last, $"id".asc)))
        .where($"__rn" === 1)
        .select($"cluster_id", $"id".as("keeper"))
  }
}
