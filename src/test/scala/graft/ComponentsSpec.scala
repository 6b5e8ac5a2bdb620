package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Sampling, TrainingExport}

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

  test("ccIncrement: new edge fusing two old clusters takes the global min") {
    import spark.implicits._
    val old1 = Components.connectedComponents(
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    // increment 1: fuse {1,2} with {3,4}; increment 2: extend with a new node
    val after1 = Components.ccIncrement(old1, Seq((2L, 3L)).toDF("id_a", "id_b"))
    assert(after1.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val after2 = Components.ccIncrement(after1, Seq((4L, 0L)).toDF("id_a", "id_b"))
    assert(after2.as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("ccIncrement: chunked pair arrival equals the single-batch labeling") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, minJaccQ = 500, maxDf = 50)
      .select($"id_a", $"id_b").localCheckpoint()
    val batch = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    val c1 = pairs.where(($"id_a" + $"id_b") % 2 === 0)
    val c2 = pairs.where(($"id_a" + $"id_b") % 2 === 1)
    val chunked = Components.ccIncrement(Components.connectedComponents(c1), c2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty && batch == chunked)
  }

  test("keeperPerCluster: min-id default; incremental labels give the same keepers as batch") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, minJaccQ = 500, maxDf = 50)
      .select($"id_a", $"id_b").localCheckpoint()
    val batchKeepers = Components.keeperPerCluster(
        Components.connectedComponents(pairs))
      .as[(Long, Long)].collect().sorted.toSeq
    // min-id keeper of a connectedComponents labeling IS the cluster id
    assert(batchKeepers.nonEmpty && batchKeepers.forall { case (c, k) => c == k })
    // same keepers when the labels were maintained incrementally
    val c1 = pairs.where(($"id_a" + $"id_b") % 2 === 0)
    val c2 = pairs.where(($"id_a" + $"id_b") % 2 === 1)
    val incKeepers = Components.keeperPerCluster(
        Components.ccIncrement(Components.connectedComponents(c1), c2))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(incKeepers == batchKeepers)
  }

  test("keeperPerCluster: score-ranked keeper, deterministic tie-break by min id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 10L), (2L, 90L), (3L, 90L), (7L, 5L), (9L, 5L))
      .toDF("id", "score")
    val got = Components.keeperPerCluster(labels, Some(scores))
      .as[(Long, Long)].collect().toMap
    // cluster 1: 2 and 3 tie at 90 -> min id 2; cluster 7: tie at 5 -> 7
    assert(got == Map(1L -> 2L, 7L -> 7L), got.toString)
    // score coverage gaps never drop a cluster: a partially-scored
    // cluster ranks scoreless members last; a fully-unscored cluster
    // falls back to the min-id keeper (one keeper per cluster, ALWAYS)
    val gappy = Seq((1L, 1L), (2L, 1L), (20L, 20L), (30L, 20L))
      .toDF("id", "cluster_id")
    val partial = Seq((2L, 5L)).toDF("id", "score") // 1, 20, 30 unscored
    val g2 = Components.keeperPerCluster(gappy, Some(partial))
      .as[(Long, Long)].collect().toMap
    assert(g2 == Map(1L -> 2L, 20L -> 20L), g2.toString)
  }

  test("corpusToPacks transitive dedup: one gated member per cluster, gated-min survives") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, minJaccQ = 500, maxDf = 50)
    val labels = Components.connectedComponents(pairs, "id_a", "id_b")
      .localCheckpoint()
    val rates = Seq(("en", 1000), ("de", 1000), ("fr", 1000), ("es", 1000),
      ("zh", 1000)).toDF("lang", "kpm")
    val exported = graft.operators.TrainingExport.corpusToPacks(
      docs, rates, minQuality = 60, budget = 512L, nShards = 8,
      nearDupLabels = Some(labels))
    val lbl = labels.select($"id".as("doc_id"), $"cluster_id")
    // every cluster with >=1 exported member exports EXACTLY one
    val perCluster = exported.join(lbl, Seq("doc_id"))
      .groupBy($"cluster_id").agg(count(lit(1)).as("n"))
    assert(perCluster.where($"n" =!= 1).isEmpty)
    // and that one is the min-id member among the docs the gates kept:
    // recompute the no-dedup export (same gates) and compare per-cluster
    val gatedOnly = graft.operators.TrainingExport.corpusToPacks(
      docs, rates, minQuality = 60, budget = 512L, nShards = 8)
    val expectedKeeper = gatedOnly.join(lbl, Seq("doc_id"))
      .groupBy($"cluster_id").agg(min($"doc_id").as("doc_id"))
    val gotKeeper = exported.join(lbl, Seq("doc_id"))
      .select($"cluster_id", $"doc_id")
    assert(gotKeeper.exceptAll(expectedKeeper.select($"cluster_id", $"doc_id")).isEmpty &&
      expectedKeeper.select($"cluster_id", $"doc_id").exceptAll(gotKeeper).isEmpty)
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

  test("trainValTestSplit: exhaustive, nests by threshold, salt-independent of bernoulli") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("doc_id")
    val s1 = Sampling.trainValTestSplit(ids, "doc_id", 700, 150).cache()
    // every row labeled, proportions near 700/150/150
    val byS = s1.groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test") && byS.values.sum == 2000L)
    assert(byS("train") > 1300 && byS("train") < 1500, byS.toString)
    // growing trainPm only moves rows INTO train; eval sets nest
    val s2 = Sampling.trainValTestSplit(ids, "doc_id", 850, 75)
    val t1 = s1.where($"split" === "train").select($"doc_id")
    val t2 = s2.where($"split" === "train").select($"doc_id")
    assert(t1.exceptAll(t2).isEmpty && t1.count() < t2.count(),
      "train sets must nest as trainPm grows")
    // salted hash: a bernoulli sample is NOT confined to one split (the
    // unsalted hash would put every sampled row in train)
    val sampled = Sampling.bernoulli(ids, "doc_id", 300)
    val splitsOfSample = Sampling.trainValTestSplit(sampled, "doc_id", 700, 150)
      .select($"split").distinct().as[String].collect().toSet
    assert(splitsOfSample == Set("train", "val", "test"),
      s"bernoulli sample collapsed into $splitsOfSample — salt broken")
    // deterministic across partitioning/input order
    val s1b = Sampling.trainValTestSplit(
      ids.orderBy(rand(11)).repartition(13), "doc_id", 700, 150)
    assert(s1.exceptAll(s1b).isEmpty && s1b.exceptAll(s1).isEmpty)
  }

  test("bernoulliByStratum: rates nest, allowlist drops, partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 600L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val loRates = Seq(("en", 200), ("de", 600)).toDF("lang", "kpm")
    val hiRates = Seq(("en", 500), ("de", 900)).toDF("lang", "kpm")
    val lo = Sampling.bernoulliByStratum(docs, "doc_id", "lang", loRates)
    val hi = Sampling.bernoulliByStratum(docs, "doc_id", "lang", hiRates)
    // hu mod 1000 < p nests by p: the low-rate sample is a subset
    assert(lo.exceptAll(hi).isEmpty && lo.count() < hi.count())
    // absent stratum keeps nothing
    val enOnly = Sampling.bernoulliByStratum(docs, "doc_id", "lang",
      Seq(("en", 1000)).toDF("lang", "kpm"))
    assert(enOnly.select($"lang").distinct().as[String].collect().toSeq == Seq("en"))
    assert(enOnly.count() == docs.where($"lang" === "en").count())
    // deterministic across partitioning/input order
    val lo2 = Sampling.bernoulliByStratum(
      docs.orderBy(rand(7)).repartition(13), "doc_id", "lang", loRates)
    assert(lo.exceptAll(lo2).isEmpty && lo2.exceptAll(lo).isEmpty)
  }

  test("packByTokenBudget: contiguous cover per shard, straddle contract") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, 1 + (i % 37).toInt)).toDF("doc_id", "toks")
    val p = Sampling.packByTokenBudget(docs, "doc_id", "toks", budget = 100L, nShards = 4)
    // within a shard, packs tile the token stream: next doc's global
    // offset (pack*budget + pack_off) = previous offset + previous toks
    val gaps = p.withColumn("goff", $"pack" * 100 + $"pack_off")
      .withColumn("prev_end",
        lag($"goff" + $"toks", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"shard").orderBy($"pos")))
      .where($"prev_end".isNotNull && $"prev_end" =!= $"goff")
    assert(gaps.isEmpty)
    // pack ids dense from 0 per shard; offsets inside the budget
    assert(p.where($"pack_off" < 0 || $"pack_off" >= 100).isEmpty)
    assert(p.groupBy($"shard").agg(min($"pack").as("mn")).where($"mn" =!= 0).isEmpty)
    // deterministic across partitioning
    val p2 = Sampling.packByTokenBudget(
      docs.orderBy(rand(5)).repartition(11), "doc_id", "toks", 100L, 4)
    assert(p.exceptAll(p2).isEmpty && p2.exceptAll(p).isEmpty)
  }

  test("tokenBudgetByStratum: two-phase plan ≡ naive window, budgets nest, validation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // low-cardinality score grades (0/20/40/60/80), varied token widths,
    // two strata plus one absent from the budget table
    val docs = (0L until 900L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        ((i % 5) * 20).toInt, (1 + (i % 13)).toInt)
    }.toDF("doc_id", "lang", "q", "toks")
    val budgets = Seq(("en", 600L), ("de", 150L)).toDF("lang", "token_budget")
    val got = Sampling.tokenBudgetByStratum(
      docs, "doc_id", "lang", "q", "toks", budgets)
    // naive rule: rank (q DESC, hu, id) per stratum, keep while the token
    // mass strictly before is < budget
    val nw = Window.partitionBy($"lang")
      .orderBy($"q".desc, Sampling.hashUniform48($"doc_id"), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .join(broadcast(budgets), Seq("lang"))
      .withColumn("cb", sum($"toks".cast("long")).over(nw) - $"toks")
      .where($"cb" < $"token_budget")
      .select(docs.columns.map(col).toSeq: _*)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      s"two-phase=${got.count()} naive=${naive.count()}")
    // the straddling doc is included: kept mass reaches (>=) the budget
    val mass = got.groupBy($"lang").agg(sum($"toks").as("m")).as[(String, Long)]
      .collect().toMap
    assert(mass("en") >= 600L && mass("de") >= 150L, mass.toString)
    // absent stratum keeps nothing; budgets nest
    assert(got.where($"lang" === "fr").isEmpty)
    val smaller = Sampling.tokenBudgetByStratum(docs, "doc_id", "lang",
      "q", "toks", Seq(("en", 200L), ("de", 60L)).toDF("lang", "token_budget"))
    assert(smaller.exceptAll(got).isEmpty && smaller.count() < got.count())
    // budget <= 0 keeps nothing
    assert(Sampling.tokenBudgetByStratum(docs, "doc_id", "lang", "q",
      "toks", Seq(("en", 0L)).toDF("lang", "token_budget")).isEmpty)
    // null score / null tokens dropped up front
    val withNulls = docs.unionByName(
      Seq((9001L, "en", null.asInstanceOf[Integer], Integer.valueOf(5)),
          (9002L, "en", Integer.valueOf(100), null.asInstanceOf[Integer]))
        .toDF("doc_id", "lang", "q", "toks"))
    val gotN = Sampling.tokenBudgetByStratum(
      withNulls, "doc_id", "lang", "q", "toks", budgets)
    assert(gotN.where($"doc_id" >= 9000L).isEmpty)
    // deterministic across partitioning / input order
    val got2 = Sampling.tokenBudgetByStratum(
      docs.orderBy(rand(3)).repartition(13), "doc_id", "lang", "q", "toks", budgets)
    assert(got.exceptAll(got2).isEmpty && got2.exceptAll(got).isEmpty)
    // validation: swapped budget columns, wrong arity, reserved columns
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetByStratum(docs, "doc_id", "lang", "q", "toks",
        Seq((600L, "en")).toDF("token_budget", "lang"))
    }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetByStratum(docs, "doc_id", "lang", "q", "toks",
        Seq(("en", 600L, 1)).toDF("lang", "token_budget", "x"))
    }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetByStratum(docs.withColumn("__cb", lit(1)),
        "doc_id", "lang", "q", "toks", budgets)
    }
  }

  test("fimSplit: segments reassemble, cuts in range and deterministic, short-doc passthrough") {
    import spark.implicits._
    val rnd = new scala.util.Random(125)
    val docs = ((0 until 200).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(30)))
        .map(j => s"w${rnd.nextInt(9)}x$j").mkString(" "))
    } ++ Seq((900L, ""), (901L, "one"), (902L, "one two")))
      .toDF("doc_id", "text")
    val got = TrainingExport.fimSplit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val texts = docs.as[(Long, String)].collect().toMap
    for ((id, (_, n, i, j, fim)) <- got) {
      val w = texts(id).trim.split("\\s+", -1).toSeq
      assert(n == w.size, s"doc $id")
      if (w.size < 3) {
        assert((i, j) == (0L, 0L) && fim == texts(id), s"doc $id passthrough")
      } else {
        assert(0 < i && i < j && j < n, s"doc $id cuts ($i, $j) of $n")
        // PSM re-serialization carries every token exactly once
        val want = "<FIM_PRE>" + w.take(i.toInt).mkString(" ") +
          "<FIM_SUF>" + w.drop(j.toInt).mkString(" ") +
          "<FIM_MID>" + w.slice(i.toInt, j.toInt).mkString(" ")
        assert(fim == want, s"doc $id")
      }
    }
    // cuts are a pure function of the id: stable across partitionings
    val again = TrainingExport.fimSplit(
      docs.orderBy(rand(5)).repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
    // and the cut positions actually vary across docs (not degenerate)
    assert(got.values.filter(_._2 >= 3).map(v => (v._3, v._4)).toSet.size > 20)
  }

  test("packedSequences: budget-exact packs, token-exact straddle splits, text round-trip") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    val seqs = graft.operators.TrainingExport.packedSequences(
      docs, "doc_id", "text", budget = 512L, nShards = 8).cache()
    // every pack except the LAST of its shard holds exactly 512 tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"shard")
    val bad = seqs.withColumn("last", max($"pack").over(w))
      .where($"pack" =!= $"last" && $"seq_toks" =!= 512L)
    assert(bad.isEmpty, bad.collect().take(3).mkString(";"))
    // seq_toks is honest: re-counting the materialized text agrees
    val lying = seqs.where(
      graft.operators.TextAnalysis.tokenCount($"seq_text") =!= $"seq_toks")
    assert(lying.isEmpty)
    // packs are dense from 0 per shard
    val dense = seqs.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pack").as("mn"), max($"pack").as("mx"))
      .where($"mn" =!= 0 || $"mx" =!= $"n" - 1)
    assert(dense.isEmpty)
    // token conservation: nothing lost or duplicated by the splitting
    val totalIn = docs.select(
      sum(graft.operators.TextAnalysis.tokenCount($"text"))).as[Long].head()
    val totalOut = seqs.select(sum($"seq_toks")).as[Long].head()
    assert(totalIn == totalOut, s"$totalIn != $totalOut")
    seqs.unpersist()
  }

  test("packedSequences: a doc longer than the budget spans several packs intact") {
    import spark.implicits._
    // one giant doc (1300 tokens) + a few small ones: the giant must be
    // split across >= 3 packs and concatenating its shard's sequences
    // must reproduce the token stream exactly
    val giant = (0 until 1300).map(i => s"g$i").mkString(" ")
    val docs = (Seq((100L, giant)) ++ (0L until 6L).map(i =>
      (i, (0 until 40).map(j => s"d${i}_$j").mkString(" ")))).toDF("doc_id", "text")
    val seqs = graft.operators.TrainingExport.packedSequences(
      docs, "doc_id", "text", budget = 256L, nShards = 2)
    val perShard = seqs.orderBy($"shard", $"pack")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).mkString(" ")).toMap
    // rebuild the expected stream per shard from the layout
    val layout = graft.operators.Sampling.packByTokenBudget(
      docs.withColumn("toks",
        graft.operators.TextAnalysis.tokenCount($"text").cast("long")),
      "doc_id", "toks", 256L, 2)
      .orderBy($"shard", $"pos").select($"shard", $"text")
      .as[(Long, String)].collect()
    val expected = layout.groupBy(_._1).view
      .mapValues(_.map(_._2.trim.split("\\s+").mkString(" ")).mkString(" ")).toMap
    assert(perShard == expected)
    // the giant doc straddles: it alone fills >= 4 packs somewhere
    assert(seqs.count() >= 6)
  }

  test("packBoundaries: mask offsets match the sequence layout, spill-only packs flagged") {
    import spark.implicits._
    // one shard so the layout is a single deterministic stream; a giant
    // (600 tokens at budget 256) creates a spill-only middle pack
    val giant = (0 until 600).map(i => s"g$i").mkString(" ")
    val docs = (Seq((100L, giant)) ++ (0L until 5L).map(i =>
      (i, (0 until 40).map(j => s"d${i}_$j").mkString(" ")))).toDF("doc_id", "text")
    val b = graft.operators.TrainingExport.packBoundaries(
        docs, "doc_id", "text", budget = 256L, nShards = 1)
      .orderBy($"pack")
      .as[(Long, Long, Long, String, Boolean)].collect()
    // reference: replay the layout locally
    val layout = graft.operators.Sampling.packByTokenBudget(
        docs.withColumn("toks",
          graft.operators.TextAnalysis.tokenCount($"text").cast("long")),
        "doc_id", "toks", 256L, 1)
      .orderBy($"pos").select($"pack_off", $"toks").as[(Long, Long)].collect()
    val lastPack = (layout.map(_._2).sum - 1) / 256
    val heads = graft.operators.Sampling.packByTokenBudget(
        docs.withColumn("toks",
          graft.operators.TextAnalysis.tokenCount($"text").cast("long")),
        "doc_id", "toks", 256L, 1)
      .select($"pack", $"pack_off").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    b.foreach { case (_, pack, nDocs, bounds, cont) =>
      val expect = heads.getOrElse(pack, Array.empty[Long]).toSeq
      assert(nDocs === expect.size, s"pack $pack")
      assert(bounds === expect.mkString(","), s"pack $pack")
      assert(cont === !expect.headOption.contains(0L), s"pack $pack")
    }
    // every pack 0..last is present — including the giant's spill-only
    // middle pack(s), which start mid-document with no new doc
    assert(b.map(_._2).toSeq === (0L to lastPack),
      s"packs ${b.map(_._2).mkString(",")}")
    assert(b.exists(x => x._3 == 0L && x._5), "no spill-only pack exercised")
    // boundaries partition the token stream: the mask spec and the
    // materialized sequences agree on every pack's width
    val seqs = graft.operators.TrainingExport.packedSequences(
        docs, "doc_id", "text", budget = 256L, nShards = 1)
      .select($"pack", $"seq_toks").as[(Long, Long)].collect().toMap
    assert(b.map(_._2).toSet === seqs.keySet)
  }

  test("writePackedSequences: shard=NN hive layout, pruned read, pack-sorted files") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    val seqs = graft.operators.TrainingExport.packedSequences(
      docs, "doc_id", "text", budget = 512L, nShards = 4)
    val dir = java.nio.file.Files.createTempDirectory("packs").toString
    graft.operators.TrainingExport.writePackedSequences(seqs, dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.length == 4, shards.mkString(","))
    // partition-pruned read returns exactly that shard, pack-readable
    val one = spark.read.parquet(dir).where($"shard" === 2)
    val expect = seqs.where($"shard" === 2)
    assert(one.select($"pack", $"seq_toks", $"seq_text")
      .exceptAll(expect.select($"pack", $"seq_toks", $"seq_text")).isEmpty)
    assert(expect.count() == one.count() && one.count() > 0)
    // the export manifest (dataset card) cross-checks against the data
    val card = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_export.json")), "UTF-8")
    val wantPacks = seqs.count()
    val wantToks = seqs.agg(sum($"seq_toks")).as[Long].head()
    assert(card.contains(s""""shards":4""") &&
      card.contains(s""""packs":$wantPacks""") &&
      card.contains(s""""tokens":$wantToks"""), card)
  }

  test("corpusToPacks: gates drop junk, dedup keeps min id, layout invariant") {
    import spark.implicits._
    val body = "the cat and the dog is happy to be in the warm house with food " * 4
    val good = (0L until 50L).map(i => (i, "web", s"document number $i $body"))
    val dups = (0L until 50L).map(i => (i + 100L, "web", s"document number $i $body"))
    val junk = (90L until 100L).map(i => (i + 900L, "web", "short text"))
    val docs = (good ++ dups ++ junk).toDF("doc_id", "source", "text")
    val rates = Seq(("en", 1000)).toDF("lang", "kpm")
    val out = TrainingExport.corpusToPacks(docs, rates,
      minQuality = 60, budget = 64L, nShards = 4)
    // junk gated out, duplicate texts collapse to the min doc_id
    assert(out.count() == 50L)
    assert(out.where($"doc_id" >= 50L).isEmpty)
    assert(out.columns.toSet ==
      Set("doc_id", "source", "lang_pred", "q", "toks",
        "shard", "pos", "pack", "pack_off"))
    // the exported layout is a pure function of the rows
    val out2 = TrainingExport.corpusToPacks(
      docs.orderBy(rand(3)).repartition(17), rates, 60, 64L, 4)
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
  }

  test("ratebookForTargetMix: integer plan, scarcest stratum caps, allowlist") {
    import spark.implicits._
    // en=600, de=300, zh=100 docs; targets 500/300/200 per-mille.
    // caps = 1000·n/t: en 1200, de 1000, zh 500 → n_out = 500 (zh-bound)
    // keep = n_out·t/1000: en 250, de 150, zh 100
    // rate = 1000·keep/n:  en 416, de 500, zh 1000
    val docs = ((0L until 600L).map(i => (i, "en")) ++
      (600L until 900L).map(i => (i, "de")) ++
      (900L until 1000L).map(i => (i, "zh")) ++
      (1000L until 1050L).map(i => (i, "fr"))) // fr absent from targets
      .toDF("doc_id", "lang")
    val targets = Seq(("en", 500), ("de", 300), ("zh", 200))
      .toDF("lang", "target_pm")
    val got = Sampling.ratebookForTargetMix(docs, "lang", targets)
      .select($"lang", $"n_docs", $"keep_docs", $"rate_pm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("en", 600L, 250L, 416L), ("de", 300L, 150L, 500L),
      ("zh", 100L, 100L, 1000L)), got.toString)
    // downsample-only by construction: no rate exceeds 1000
    // (zh keeps everything — the binding stratum is taken whole)
    // validation: wrong arity and non-numeric rate column fail fast
    intercept[IllegalArgumentException] {
      Sampling.ratebookForTargetMix(docs, "lang",
        Seq(("en", 1, 2)).toDF("a", "b", "c"))
    }
    intercept[IllegalArgumentException] {
      Sampling.ratebookForTargetMix(docs, "lang",
        Seq((500, "en")).toDF("target_pm", "lang"))
    }
    // composes with bernoulliByStratum: realized mix ≈ target shares
    val rb = Sampling.ratebookForTargetMix(docs, "lang", targets)
    val kept = Sampling.bernoulliByStratum(docs, "doc_id", "lang",
      rb.select($"lang", $"rate_pm"))
    val byLang = kept.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(byLang("zh") == 100L) // rate 1000 keeps the stratum whole
    assert(math.abs(byLang("en") - 250L) < 60 &&
      math.abs(byLang("de") - 150L) < 50, byLang.toString)
    // a TARGETED stratum absent from the corpus forces the whole
    // ratebook to zero (the mix is unreachable without it) — per the
    // n_out = min_s formula, never a silently-wrong mix
    val withGhost = Sampling.ratebookForTargetMix(docs, "lang",
      Seq(("en", 500), ("xx", 500)).toDF("lang", "target_pm"))
      .select($"lang", $"n_docs", $"keep_docs", $"rate_pm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(withGhost == Set(("en", 600L, 0L, 0L), ("xx", 0L, 0L, 0L)),
      withGhost.toString)
    // a non-positive target fails the query loudly, not div-by-zero-to-NULL
    val boom = intercept[Exception] {
      Sampling.ratebookForTargetMix(docs, "lang",
        Seq(("en", 0)).toDF("lang", "target_pm")).collect()
    }
    assert(boom.getMessage != null)
    // token-weighted planning: same integer plan over summed weights,
    // checked against an independent Scala replay of the formula
    val wdocs = docs.withColumn("toks", lit(10L) + ($"doc_id" % 5))
    val wgot = Sampling.ratebookForTargetMix(wdocs, "lang", targets, Some("toks"))
      .select($"lang", $"n_docs", $"keep_docs", $"rate_pm")
      .as[(String, Long, Long, Long)].collect().toSet
    val wOf = (id: Long) => 10L + (id % 5)
    val ns = Map("en" -> (0L until 600L), "de" -> (600L until 900L),
      "zh" -> (900L until 1000L)).map { case (l, r) => l -> r.map(wOf).sum }
    val ts = Map("en" -> 500L, "de" -> 300L, "zh" -> 200L)
    val nOut = ns.map { case (l, n) => (1000L * n) / ts(l) }.min
    val wExpect = ns.map { case (l, n) =>
      val keep = (nOut * ts(l)) / 1000L
      (l, n, keep, (1000L * keep) / n)
    }.toSet
    assert(wgot == wExpect, s"got $wgot want $wExpect")
  }

  test("epochOrder: dense permutation per shard, epoch-keyed, md5-faithful") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    val sa = Sampling.shardAssign(docs, "doc_id", 4).drop("pos")
    val e1 = TrainingExport.epochOrder(sa, "shard", "doc_id", 1L)
    // ord is exactly 1..n within every shard
    val bad = e1.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"ord").as("mx"), min($"ord").as("mn"),
        countDistinct($"ord").as("d"))
      .where($"mx" =!= $"n" || $"mn" =!= 1 || $"d" =!= $"n")
    assert(bad.isEmpty)
    // different epochs give different permutations of the same rows
    val e2 = TrainingExport.epochOrder(sa, "shard", "doc_id", 2L)
    assert(e1.join(e2, Seq("shard", "doc_id"))
      .where(e1("ord") === e2("ord")).count() < 100L)
    // bit-identical across partitioning / input order
    val e1b = TrainingExport.epochOrder(
      sa.orderBy(rand(9)).repartition(13), "shard", "doc_id", 1L)
    assert(e1.exceptAll(e1b).isEmpty && e1b.exceptAll(e1).isEmpty)
    // the order IS ascending (md5-hash48, id) — independent Scala md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val shard0 = e1.where($"shard" === 0).orderBy($"ord")
      .select($"doc_id").as[Long].collect()
    val expect = shard0.sortBy(id => (h48(s"1:$id"), id))
    assert(shard0.toSeq == expect.toSeq)
  }
}
