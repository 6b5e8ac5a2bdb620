package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Physical-plan assertions: the scale-critical plan shapes hold (these
  * are the shapes a 1000-executor run depends on, checked structurally so
  * a refactor cannot silently regress them). */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bruteForceTopK: broadcast scoring + partial top-k before the exchange") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val p = plan(Similarity.bruteForceTopK(
      emb.where($"vec_id" < 5), emb, "vec_id", "vec_id", "embedding", "embedding", 3))
    // corpus stays partitioned; small query side broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), s"no broadcast NL join:\n$p")
    // the TopK aggregator must appear as a two-phase object aggregate
    // (partial before the exchange, final after) — NOT a window over the
    // whole cross product
    assert(p.contains("ObjectHashAggregate"), s"no object aggregate:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"window over the cross product leaked back in:\n$p")
    val aggs = p.split("ObjectHashAggregate").length - 1
    assert(aggs >= 2, s"expected partial+final aggregate pair, found $aggs:\n$p")
  }

  test("ivfTopK: seed scans broadcast, search is a broadcast equi-join, no cartesian") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val p = plan(Similarity.ivfTopK(emb.where($"vec_id" < 5),
      emb.where($"vec_id" >= 5), "vec_id", "vec_id", "embedding", "embedding",
      3, seedMod = 16L, nProbe = 4))
    // seed scoring passes broadcast the tiny seed table over corpus/queries
    assert(p.contains("BroadcastNestedLoopJoin"), s"seeds not broadcast:\n$p")
    // query-time search: probes broadcast into an equi-join on centroid —
    // the assigned corpus is NEVER shuffled for a query batch
    assert(p.contains("BroadcastHashJoin"), s"search not a broadcast hash join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked into IVF:\n$p")
    // bounded top-k stays a two-phase object aggregate
    assert(p.split("ObjectHashAggregate").length - 1 >= 2, s"no partial top-k:\n$p")
  }

  test("PQ adcTopK: LUTs broadcast over the codes scan, partial top-k before the exchange") {
    import spark.implicits._
    import graft.operators.ProductQuant
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val corpus = emb.where($"vec_id" >= 10)
    val books = ProductQuant.codebooks(corpus, "vec_id", "embedding", 64, 4, 16L)
    val codes = ProductQuant.encode(corpus, "vec_id", "embedding", books, 64, 4)
    val p = plan(ProductQuant.adcTopK(emb.where($"vec_id" < 5), codes, books,
      "vec_id", "embedding", 64, 4, 3))
    // the (tiny) per-query LUT table is broadcast; the codes scan stays
    // partitioned and is never shuffled before scoring
    assert(p.contains("BroadcastNestedLoopJoin"), s"LUTs not broadcast:\n$p")
    assert(p.split("ObjectHashAggregate").length - 1 >= 2, s"no partial top-k:\n$p")
  }

  test("PQ ivfAdcTopK: probes and LUTs broadcast into equi-joins, no cartesian at query time") {
    import spark.implicits._
    import graft.operators.ProductQuant
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val p = plan(ProductQuant.ivfAdcTopK(emb.where($"vec_id" < 5),
      emb.where($"vec_id" >= 10), "vec_id", "vec_id", "embedding", "embedding",
      64, 4, 3, seedMod = 16L, nProbe = 4))
    // coarse probe selection broadcasts seeds; the indexed codes join
    // probes and LUTs via broadcast hash joins — the corpus-scale side is
    // shuffled only in the build (cells ⋈ codes), never per query batch
    assert(p.contains("BroadcastNestedLoopJoin"), s"seeds not broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe/LUT join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked into IVF+PQ:\n$p")
  }

  test("q44 near-dup keepers: band equi-join, no cartesian, sigs built without an aggregate") {
    val df = Queries.all.find(_.name == "q44_near_dup_keepers").get
      .fn(spark, sf("sf0.001"))
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup self-join must stay keyed on (band, sig):\n$p")
    // rowwise signatures are a stateless projection — the only aggregate
    // allowed in the plan is the keeper-side distinct
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val sigsPlan = plan(graft.operators.Dedup.minhashBandsRowwise(
      docs.select(col("doc_id"), col("text")), "doc_id", "text", 3, 8))
    assert(!sigsPlan.contains("Aggregate") && !sigsPlan.contains("Exchange"),
      s"rowwise sigs must not shuffle or aggregate:\n$sigsPlan")
  }

  test("q21 reuses the shingle exchange: corpus scanned at most 3x") {
    // the minhash pipeline consumes the shingle set from several branches
    // (bands, sizes, both intersection sides, the df-cap); without
    // exchange reuse each branch would re-scan + re-shingle the corpus —
    // at 100 TB that is the difference between one pass and five. Checked
    // with AQE off because the AQE plan STRING shows the pre-reuse tree
    // (runtime stage reuse is invisible to a grep); the static reuse
    // condition (canonically identical subtrees) is the same one AQE uses.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.all.find(_.name == "q21_minhash_lsh_pairs").get
        .fn(spark, sf("sf0.001"))
      val p = plan(df)
      val scans = p.split("Scan parquet").length - 1
      val reuses = p.split("ReusedExchange").length - 1
      assert(scans <= 3, s"corpus scanned $scans times — shingle reuse lost:\n$p")
      assert(reuses >= 4, s"only $reuses reused exchanges — branches re-derive:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q06 selective filter pushes predicates into the parquet scan") {
    val df = Queries.all.find(_.name == "q06_selective_filter").get
      .fn(spark, sf("sf0.001"))
    val p = plan(df)
    assert(p.contains("PushedFilters: [") &&
      p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)].*", "$1").nonEmpty,
      s"no pushed filters in scan:\n$p")
  }

  test("q02 joins broadcast every dimension table") {
    val df = Queries.all.find(_.name == "q02_revenue_by_nation").get
      .fn(spark, sf("sf0.001"))
    val p = plan(df)
    val broadcasts = p.split("BroadcastHashJoin").length - 1
    assert(broadcasts >= 3, s"expected >=3 broadcast dim joins, got $broadcasts:\n$p")
  }

  test("extraction prunes the html blob before any exchange") {
    import spark.implicits._
    val pages = graft.sources.PageGen.rawPages(spark,
      graft.sources.PageGenConfig(nPages = 100L, nHosts = 5, parallelism = 2)).toDF()
    val df = pages
      .withColumn("text", graft.functions.ExtractHtmlText.extract_html_text($"html"))
      .drop("html")
      .groupBy($"host").agg(sum(length($"text")).as("chars"))
    val p = plan(df)
    // what crosses the shuffle is the OUTPUT of the exchange's child (the
    // partial aggregate) — it must not carry the binary blob
    val lines = p.linesIterator.toSeq
    val exchangeAt = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exchangeAt >= 0, s"expected a shuffle for the aggregation:\n$p")
    val childOutput = lines.drop(exchangeAt + 1)
      .find(_.contains("output=[")).getOrElse("")
    assert(childOutput.contains("output=[") && !childOutput.contains("html"),
      s"html blob crosses the exchange: $childOutput\n$p")
    // and the blob IS still present below (i.e. the test would catch it)
    assert(p.contains("html"), s"fixture lost the blob column:\n$p")
  }

  test("ratebookForTargetMix: targets and scalar min broadcast, corpus never shuffled past the count") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val targets = Seq(("en", 500), ("de", 300), ("zh", 200))
      .toDF("lang", "target_pm")
    val rb = graft.operators.Sampling.ratebookForTargetMix(docs, "lang", targets)
    val p = plan(rb)
    // the targets dim and the single-row n_out scalar both broadcast
    assert(p.split("BroadcastExchange").length - 1 >= 2,
      s"targets/scalar-min not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"ratebook derivation shuffled a join side:\n$p")
    // downstream sampling keeps the SAME shape: corpus scan → broadcast
    // join → filter, no corpus exchange for membership
    val kept = graft.operators.Sampling.bernoulliByStratum(
      docs, "doc_id", "lang", rb.select($"lang", $"rate_pm"))
    val kp = plan(kept.select($"doc_id"))
    assert(kp.contains("BroadcastHashJoin"), s"ratebook not broadcast:\n$kp")
  }

  test("rareTokenStats: lexicon join is shuffled (NOT broadcast), doc side pre-reduced") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val lex = graft.operators.TextAnalysis.termFrequencies(docs, "text")
    val p = plan(graft.operators.TextAnalysis.rareTokenStats(
      docs, "doc_id", "text", lex, 3L))
    // the corpus-vocabulary lexicon must NOT be broadcast (it scales with
    // the corpus): the join is a shuffled equi-join on term
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"lexicon join not a shuffled equi-join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"lexicon was broadcast:\n$p")
    // the doc side is reduced to (doc, term, cnt) BEFORE the join: an
    // aggregate keyed by (doc_id, term) must exist below the join —
    // anchoring on both keys so the lexicon's own term-only aggregate
    // (always present below the join) cannot satisfy the assert
    assert(p.linesIterator.exists(l => l.contains("HashAggregate") &&
        l.contains("doc_id") && l.contains("term")),
      s"doc side not pre-reduced to (doc, term, cnt) before the lexicon join:\n$p")
  }

  test("link plane: extraction in the scan stage, ONE exchange per index") {
    import spark.implicits._
    val pages = Seq(("a.com", "<a href=\"https://b.com/x\">t</a>"))
      .toDF("host", "raw")
      .select(col("host"), encode(col("raw"), "UTF-8").as("html"))
    // outlink/anchor extraction must pipeline into the scan stage: the
    // only exchange is the final count aggregation on the bounded key
    // space — nothing shuffles pages or raw html
    for (df <- Seq(graft.operators.LinkGraph.hostEdges(pages, "html", "host"),
        graft.operators.LinkGraph.anchorIndex(pages, "html", "host"))) {
      val p = plan(df)
      val exchanges = p.split("Exchange hashpartitioning").length - 1
      assert(exchanges == 1, s"expected ONE hash exchange, got $exchanges:\n$p")
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
        s"unexpected join in a pure scan+agg plan:\n$p")
    }
  }

  test("LM scoreDocs: equi-join probes, 1-row V broadcast, partial doc agg") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val model = graft.operators.LanguageModel.bigramIncrement(
      docs.where($"doc_id" % 3 === 0), "text")
    val p = plan(graft.operators.LanguageModel.scoreDocs(
      docs.where($"doc_id" % 3 =!= 0), model, "doc_id", "text"))
    // the only nested-loop join allowed is the broadcast of the 1-row V
    // scalar; model probes are hash equi-joins; never a cartesian
    assert(!p.contains("CartesianProduct"), s"cartesian at score time:\n$p")
    val nl = p.split("BroadcastNestedLoopJoin").length - 1
    assert(nl == 1, s"expected exactly the 1-row V broadcast, got $nl:\n$p")
    // per-doc mean must partial-aggregate before its exchange (map-side
    // combine is what shrinks corpus-scale bigram rows to one row per doc)
    val aggs = p.split("HashAggregate").length - 1
    assert(aggs >= 2, s"no partial+final aggregate pair on doc_id:\n$p")
  }

  test("semDedup serving/maintenance: requests broadcast INTO history, history never broadcast") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val c = emb.select($"vec_id".as("corpus_id"), $"embedding".as("cv"),
      graft.operators.VectorOps.norm_q($"embedding").as("cn"))
    val seeds = c.where($"corpus_id" % 16 === 0)
      .select($"corpus_id".as("seed_id"), $"cv".as("sv"), $"cn".as("sn"))
    val hist = Similarity.semDedupAssigned(c, seeds, 150000L)
      .where($"kept").select($"corpus_id", $"cv", $"cn", $"centroid")
    val p = plan(graft.operators.RequestResponse.semDedupProbe(
      emb.where($"vec_id" < 5), hist, seeds, "vec_id", "embedding", 150000L))
    // request assignment is the seed broadcast (nested-loop over the tiny
    // frozen seed table); the history probe must be a hash equi-join on
    // centroid with the REQUEST side as the build (BuildRight — history
    // scales with the corpus and must never be the broadcast side)
    assert(p.contains("BroadcastNestedLoopJoin"), s"seeds not broadcast:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("BuildRight")),
      s"history probe not a BuildRight broadcast equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked in:\n$p")
    val pInc = plan(Similarity.semDedupIncrement(hist,
      c.where($"corpus_id" % 2 === 1), seeds, 150000L))
    assert(pInc.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("BuildRight")),
      s"increment's history probe not BuildRight:\n$pInc")
    assert(!pInc.contains("CartesianProduct"), s"cartesian in increment:\n$pInc")
  }

  test("semDedup text gate: codegen'd hashed_tf in the scan, batch broadcast, history probed in place") {
    import spark.implicits._
    import graft.operators.{RequestResponse, TextAnalysis, VectorOps}
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    val corpus = TextAnalysis.hashedTfVector(docs, "doc_id", "text", 32)
      .select($"doc_id".as("corpus_id"), $"tf_vec".cast("array<float>").as("cv"))
      .withColumn("cn", VectorOps.norm_q($"cv")).where($"cn" > 0L)
    val seeds = corpus.where($"corpus_id" % 16 === 0)
      .select($"corpus_id".as("seed_id"), $"cv".as("sv"), $"cn".as("sn"))
    val hist = Similarity.semDedupAssigned(corpus, seeds, 900000L)
      .where($"kept").select($"corpus_id", $"cv", $"cn", $"centroid")
    val p = plan(RequestResponse.semDedupGateKeep(
      docs.select(concat(lit("u"), $"doc_id").as("url"), $"text"),
      hist, seeds, "url", "text", 32, 900000L))
    // the featurizer is the single-pass expression, not the HOF chain
    assert(p.contains("hashed_tf"), s"codegen'd featurizer missing:\n$p")
    assert(!p.contains("transform(") || !p.contains("aggregate("),
      s"interpreted HOF fold leaked into the gate path:\n$p")
    // the batch probes history via a BuildRight broadcast equi-join —
    // history (corpus-scale) must never be the broadcast side
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("BuildRight")),
      s"history probe not a BuildRight broadcast equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked in:\n$p")
  }

  test("BPE: wordFreqs partial-aggregates map-side; encode is one codegen'd projection") {
    import spark.implicits._
    import graft.operators.Bpe
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val pWf = plan(Bpe.wordFreqs(docs, "text"))
    // the corpus-scale count must combine map-side: partial+final pair
    val aggs = pWf.split("HashAggregate").length - 1
    assert(aggs >= 2, s"wordFreqs lost its partial aggregate:\n$pWf")
    // encoding is a row-local projection INSIDE whole-stage codegen
    // (no exchange, no interpreted fallback) — the scan and the
    // bpe_encode projection share one codegen span
    val merges = Seq(Bpe.Merge("s", "o", 0L, 0), Bpe.Merge("r", "t", 0L, 1))
    val pEnc = plan(docs.select($"doc_id", Bpe.encode($"text", merges).as("enc")))
    assert(pEnc.linesIterator.exists(l =>
        l.contains("bpe_encode") && l.contains("*(")),
      s"bpe_encode not in a codegen span:\n$pEnc")
    assert(!pEnc.contains("Exchange"), s"encode projection shuffles:\n$pEnc")
  }

  test("epochDrift: one tokenize pass (token exchange reused), totals broadcast") {
    import spark.implicits._
    // AQE off so static exchange reuse is visible in the plan string
    // (same reasoning as the q21 test above)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
        .withColumn("epoch", $"doc_id" % 4)
      val p = plan(graft.operators.TextAnalysis.epochDrift(docs, "epoch", "text"))
      // the (group, term) token-scale aggregate feeds the per-group
      // totals, the corpus rollup, AND the probe join: its exchange must
      // be REUSED, not recomputed — one tokenize of the corpus, not five
      val scans = p.split("Scan parquet").length - 1
      val reuses = p.split("ReusedExchange").length - 1
      assert(scans == 1, s"corpus tokenized $scans times — reuse lost:\n$p")
      assert(reuses >= 3, s"only $reuses reused exchanges:\n$p")
      // per-group totals and the two scalar totals are broadcast back;
      // the only non-broadcast join is the vocab-scale equi-join on term
      assert(p.contains("BroadcastHashJoin"), s"group totals not broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian leaked in:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("epochOrder: one exchange on shard, sort is in-partition") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id")
    val sa = graft.operators.Sampling.shardAssign(docs, "doc_id", 8).drop("pos")
    val p = plan(graft.operators.TrainingExport.epochOrder(
      sa, "shard", "doc_id", 3L))
    // the epoch permutation must not introduce a global sort: every sort
    // in the plan is the in-partition kind under a hash exchange on shard
    assert(!p.contains("rangepartitioning"), s"global sort leaked in:\n$p")
    assert(p.contains("Exchange hashpartitioning(shard"),
      s"no hash exchange on shard:\n$p")
  }

  test("sketch trio: builds are ONE partial-agg exchange, probes broadcast the sketch") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"k$i").toDF("key")
    // Bloom build: map-side partial bit_or, exactly one exchange, no join
    val pb = plan(graft.operators.BloomSet.bloomOf(keys, "key", 1024, 4, 2))
    assert(pb.split("Exchange").length - 1 == 1, s"bloom build != 1 exchange:\n$pb")
    val hb = pb.split("HashAggregate").length - 1
    assert(hb >= 2, s"bloom build lacks partial+final agg pair:\n$pb")
    // HLL registers: same single-exchange shape
    val ph = plan(graft.operators.DistinctSketch.registersOf(keys, "key", "key", 6))
    assert(ph.split("Exchange").length - 1 == 1, s"hll build != 1 exchange:\n$ph")
    // CMS build: same
    val pc = plan(graft.operators.CountMin.cmsOf(keys, "key", 6, 3))
    assert(pc.split("Exchange").length - 1 == 1, s"cms build != 1 exchange:\n$pc")
    // probes: the sketch side is BROADCAST (the corpus never reshuffles
    // onto sketch coordinates), verdict folds with an aggregate
    val bloom = graft.operators.BloomSet.bloomOf(keys, "key", 1024, 4, 2)
    val pp = plan(graft.operators.BloomSet.probe(keys, "key", bloom, 1024, 4, 2))
    assert(pp.contains("BroadcastHashJoin"), s"bloom probe not broadcast:\n$pp")
    val cms = graft.operators.CountMin.cmsOf(keys, "key", 6, 3)
    val pe = plan(graft.operators.CountMin.estimate(keys, "key", cms, 6, 3))
    assert(pe.contains("BroadcastHashJoin"), s"cms probe not broadcast:\n$pe")
  }

  test("mirror pairing: every join pinned sort-merge (no mis-broadcast), no cartesian") {
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (s"h${i % 8}", s"content ${i % 37} body")).toDF("host", "text")
    val p = plan(graft.operators.Dedup
      .mirrorHostPairs(docs, "host", "text", maxFanout = 4, minSharePm = 100))
    // fp tables are distinct-content-cardinality and the size table is
    // host-cardinality — none may ever ride a size estimate into a
    // broadcast; and groups must only pair through shared fingerprints
    assert(!p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"mirror pairing must not broadcast corpus-scaled sides:\n$p")
    assert(p.split("SortMergeJoin").length - 1 >= 4,
      s"expected the 4 pinned merge joins:\n$p")
  }

  test("changeFrequency: ONE exchange on url shared by windows and rollup") {
    import spark.implicits._
    val log = (0 until 300).map(i =>
      (s"u${i % 40}", i.toLong, i.toLong, s"v${i % 3}"))
      .toDF("url", "ts", "tie", "fp")
    val p = plan(graft.operators.UrlOps
      .changeFrequency(log, "url", "ts", "fp", "tie"))
    // the lag/row-number windows and the per-url aggregation must all
    // ride one url clustering — a second exchange would re-shuffle the
    // corpus between the window and the rollup
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"changeFrequency != 1 exchange:\n$p")
  }

  test("badWordHits is scan-stage (no join, no exchange); gateSweep is one histogram exchange") {
    import spark.implicits._
    val docs = (0 until 300)
      .map(i => (s"g${i % 3}", s"tok$i slow text", (i % 5) * 20, 1L + i % 9))
      .toDF("g", "text", "score", "toks")
    // the blocklist compiles into the projection — a plan with a join or
    // exchange here would re-introduce the per-row lookup this shape avoids
    val pg = plan(docs.select(
      graft.operators.TextAnalysis.badWordHits(col("text"), Seq("slow"))))
    assert(!pg.contains("Join") && !pg.contains("Exchange"),
      s"bad-words gate must be row-local:\n$pg")
    // sweep: the corpus crosses ONE exchange already collapsed by the
    // partial agg (rows = groups x grades); the only other exchange is the
    // window's re-clustering of that tiny histogram onto g alone — assert
    // the agg pair sits BELOW the first exchange so a refactor cannot
    // silently ship corpus rows into either
    val ps = plan(graft.operators.OrderStats.gateSweep(docs, "g", "score", "toks"))
    assert(ps.split("Exchange hashpartitioning").length - 1 == 2,
      s"gateSweep != 2 hash exchanges (collapse + tiny window recluster):\n$ps")
    assert(ps.split("HashAggregate").length - 1 >= 2,
      s"gateSweep lacks the partial+final agg pair:\n$ps")
    val lines = ps.linesIterator.toSeq
    val firstEx = lines.lastIndexWhere(_.contains("Exchange hashpartitioning"))
    assert(lines.drop(firstEx).exists(_.contains("partial_count")),
      s"partial agg must collapse rows BEFORE the first exchange:\n$ps")
  }
}
