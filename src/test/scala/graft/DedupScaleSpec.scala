package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The scale levers of the dedup family: df caps, block-permuted SimHash
  * width, corpus-derived LSH parameters. */
class DedupScaleSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001/documents.parquet")).cache()

  // long boilerplate (22 hot shingles in EVERY doc) appended to a short
  // slice of each doc's real text — the classic web footer shape
  private val boiler = " copyright footer boilerplate all rights reserved " +
    "terms of service privacy policy cookie notice contact us follow our " +
    "newsletter subscribe for updates twenty twenty six"

  test("df cap prunes hot-shingle-only pairs but keeps true near-dups") {
    import spark.implicits._
    val base = docs.where($"doc_id" < 40)
      .select($"doc_id", concat(substring($"text", 1, 60), lit(boiler)).as("text"))
    val twin = base.where($"doc_id" === 0)
      .select(($"doc_id" + 900).as("doc_id"), concat($"text", lit(" x")).as("text"))
    val corpus = base.union(twin)

    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccQ = 500, maxDf = 5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted twin pair survives (its shingles are rare)...
    assert(capped.contains((0L, 900L)), s"twin lost under cap: $capped")
    // ...and the all-pairs boilerplate clique (41 docs -> 820 pairs) is
    // gone: only genuine content overlaps remain
    assert(capped.size <= 5, s"boilerplate pairs leaked through the cap: $capped")

    // sanity: UNcapped, the boilerplate links every doc to every other doc
    // at high jaccard — the quadratic blowup the cap exists to prevent
    val uncapped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccQ = 300, maxDf = 0).count()
    assert(uncapped > 100, s"hot shingles should link many pairs uncapped: $uncapped")
  }

  test("incremental near-dup dedup over chunks equals the single-batch greedy rule") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    // single-batch greedy keepers (the q44 rule)
    val mh = Dedup.minhashBandsRowwise(docs, "doc_id", "text", 3, 8)
    val stolen = mh.join(mh.select($"doc_id".as("prior_id"), $"band", $"sig"),
        Seq("band", "sig"))
      .where($"prior_id" < $"doc_id").select($"doc_id").distinct()
    val batchKeepers = docs.join(stolen, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted.toSeq

    // same corpus processed as three id-ordered increments against a
    // growing band index (empty history to start)
    var index = Dedup.minhashBandsRowwise(docs.limit(0), "doc_id", "text", 3, 8)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val splits = Seq($"doc_id" < 60, $"doc_id" >= 60 && $"doc_id" < 140, $"doc_id" >= 140)
    for (cond <- splits) {
      val (keepers, newIndex) = Dedup.incrementalNearDupKeepers(
        index, docs.where(cond), "doc_id", "text", 3, 8)
      got ++= keepers.as[Long].collect()
      index = newIndex.localCheckpoint() // cut the growing lineage, as a real
                                         // incremental job persists its index
    }
    assert(got.sorted.toSeq == batchKeepers,
      s"inc-only=${(got.toSet -- batchKeepers).take(5)} batch-only=${(batchKeepers.toSet -- got).take(5)}")
  }

  test("incremental span-df: chunked arrival equals batch, final-chunk stats exact") {
    import spark.implicits._
    val corpus = docs.select($"doc_id", $"text")
    val batchDf = Dedup.spanDf(corpus, "doc_id", "text", 8)
    var index = batchDf.limit(0)
    var lastStats = batchDf.limit(0) // placeholder, overwritten below
    val splits = Seq($"doc_id" < 60, $"doc_id" >= 60 && $"doc_id" < 140, $"doc_id" >= 140)
    for (cond <- splits) {
      val (stats, updated) = Dedup.spanStatsIncrement(
        index, corpus.where(cond), "doc_id", "text", 8)
      lastStats = stats
      index = updated.localCheckpoint()
    }
    // merged counts after chunked arrival == the single-batch build
    assert(index.exceptAll(batchDf).isEmpty && batchDf.exceptAll(index).isEmpty)
    // by the last chunk every doc has arrived, so its stats are final
    val batchStats = Dedup.duplicatedSpanStats(corpus, "doc_id", "text", 8)
      .where($"doc_id" >= 140)
    assert(lastStats.exceptAll(batchStats).isEmpty &&
      batchStats.exceptAll(lastStats).isEmpty)
  }

  test("codegen'd SpanHashes equals the interpreted HOF twin on real docs") {
    import spark.implicits._
    val corpus = docs.select($"doc_id", $"text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expr = rows(Dedup.spanHashRows(corpus, "doc_id", "text", 8))
    val hof = rows(Dedup.spanHashRowsHof(corpus, "doc_id", "text", 8))
    assert(expr == hof,
      s"only-expr=${(expr -- hof).take(3)} only-hof=${(hof -- expr).take(3)}")
    assert(expr.nonEmpty)
  }

  test("SpanHashes equals HOF twin on adversarial whitespace/unicode corpora") {
    import spark.implicits._
    // same risk surface as MinHashBandSigs: MY replication of Spark's
    // trim (0x20 only) + split("\\s+", -1) + concat_ws(" ") semantics —
    // exercise non-space leading/trailing whitespace (kept by trim ⇒
    // empty tokens), unicode spaces, CJK, combining marks, empties, and
    // REPEATED spans (the within-doc dedup path)
    val frags = Array("word", "Wort", "été", "中文", "a", "",
      " ", "\t", "\n", "\r", "", " ", " ", "　",
      "x́", "end.", "  ", "\t\n", "tok-en", "123", "a a a a a a")
    val cases = (0 until 300).map { caseI =>
      val len = ((graft.sources.PageGen.rnd(31L, 0, caseI) >>> 1) % 24).toInt
      val s = (0 until len).map(i =>
        frags(((graft.sources.PageGen.rnd(31L, 1, caseI, i) >>> 1) % frags.length).toInt))
        .mkString("")
      (caseI.toLong, s)
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expr = rows(Dedup.spanHashRows(cases, "doc_id", "text", 2))
    val hof = rows(Dedup.spanHashRowsHof(cases, "doc_id", "text", 2))
    assert(expr == hof,
      s"only-expr=${(expr -- hof).take(3)} only-hof=${(hof -- expr).take(3)}")
  }

  test("codegen'd WordShingles equals the interpreted HOF twin (real + adversarial)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val real = docs.select($"doc_id", $"text")
    assert(rows(Dedup.shingles(real, "doc_id", "text", 3)) ==
      rows(Dedup.shinglesHof(real, "doc_id", "text", 3)))
    val frags = Array("word", "Wort", "été", "中文", "a", "",
      " ", "\t", "\n", "\r", "", " ", " ", "　",
      "x́", "end.", "  ", "\t\n", "tok-en", "123", "a a a a a a")
    val cases = (0 until 300).map { caseI =>
      val len = ((graft.sources.PageGen.rnd(37L, 0, caseI) >>> 1) % 24).toInt
      val s = (0 until len).map(i =>
        frags(((graft.sources.PageGen.rnd(37L, 1, caseI, i) >>> 1) % frags.length).toInt))
        .mkString("")
      (caseI.toLong, s)
    }.toDF("doc_id", "text")
    val expr = rows(Dedup.shingles(cases, "doc_id", "text", 2))
    val hof = rows(Dedup.shinglesHof(cases, "doc_id", "text", 2))
    assert(expr == hof,
      s"only-expr=${(expr -- hof).take(3)} only-hof=${(hof -- expr).take(3)}")
  }

  test("removeDuplicatedSpans: overlap merge, doc boundaries, identity, full cut") {
    import spark.implicits._
    val corpus = Seq(
      // A/B share the 4-token span s1..s4: at doc START in A, doc END in B
      (1L, "s1 s2 s3 s4 a1 a2 a3 a4 a5"),
      (2L, "b1 b2 s1 s2 s3 s4"),
      // C/D share the 5-token run s5..s9 ⇒ TWO overlapping dup windows in
      // C (starts 1 and 2) that must merge into one cut of tokens 1..5
      (3L, "x s5 s6 s7 s8 s9 y z w v"),
      (4L, "s5 s6 s7 s8 s9"),
      // E untouched: must come back BYTE-identical, odd whitespace and all
      (5L, "  hello\tworld  untouched unique tokens"),
      // F/G identical single-window docs ⇒ fully cut to ""
      (6L, "f1 f2 f3 f4"), (7L, "f1 f2 f3 f4"),
      // H repeats a span only WITHIN itself ⇒ df counts distinct docs ⇒
      // n_docs = 1 ⇒ untouched
      (8L, "h1 h2 h3 h4 z h1 h2 h3 h4")
    ).toDF("doc_id", "text")
    val sdf = Dedup.spanDf(corpus, "doc_id", "text", 4)
    val got = Dedup.removeDuplicatedSpans(corpus, sdf, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a1 a2 a3 a4 a5", got(1L))
    assert(got(2L) == "b1 b2", got(2L))
    assert(got(3L) == "x y z w v", got(3L))
    assert(got(4L) == "", got(4L))
    assert(got(5L) == "  hello\tworld  untouched unique tokens", got(5L))
    assert(got(6L) == "" && got(7L) == "")
    assert(got(8L) == "h1 h2 h3 h4 z h1 h2 h3 h4", got(8L))
  }

  test("removeDuplicatedSpans leaves zero duplicated spans behind (fixpoint-free rewrite)") {
    import spark.implicits._
    // the rewrite cuts every occurrence of every duplicated window, so a
    // re-run of the detector over the REWRITTEN corpus may only flag
    // spans that became adjacent after cutting — on real docs assert the
    // much stronger practical property: rewritten dup mass is gone
    val corpus = docs.select($"doc_id", $"text")
    val sdf = Dedup.spanDf(corpus, "doc_id", "text", 8)
    val rewritten = Dedup.removeDuplicatedSpans(corpus, sdf, "doc_id", "text", 8)
    // every ORIGINAL duplicated span hash is absent from the rewritten corpus
    val leftover = Dedup.spanHashRows(rewritten, "doc_id", "text", 8)
      .join(sdf.where($"n_docs" >= 2).select($"span_hash"), Seq("span_hash"))
      .count()
    assert(leftover == 0L, s"$leftover duplicated spans survived the rewrite")
    // and docs without any dup span are byte-identical
    val dupIds = Dedup.duplicatedSpanStats(corpus, "doc_id", "text", 8)
      .select($"doc_id")
    val changed = corpus.join(dupIds, Seq("doc_id"), "left_anti")
      .join(rewritten.select($"doc_id", $"text".as("new_text")), Seq("doc_id"))
      .where($"text" =!= $"new_text").count()
    assert(changed == 0L, s"$changed untouched docs were altered")
  }

  test("incremental span-df: a span unique in history is promoted by a fresh repeat") {
    import spark.implicits._
    val history = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val (stats, updated) = Dedup.spanStatsIncrement(
      Dedup.spanDf(history, "doc_id", "text", 8),
      Seq((2L, "a b c d e f g h tail")).toDF("doc_id", "text"),
      "doc_id", "text", 8)
    // doc 2's first window matches history's only span: df 1 -> 2
    assert(stats.as[(Long, Long, Long)].collect().toSeq == Seq((2L, 1L, 2L)))
    assert(updated.where($"n_docs" === 2).count() == 1L &&
      updated.count() == 2L) // promoted span + doc 2's unique second window
  }

  test("removeDuplicatedLines: cross-doc cut, within-doc kept, blanks, identity, full cut") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "shared nav\nalpha content one\n\nshared footer"),
      (2L, "shared nav\nbeta content two\nshared footer"),
      (3L, "gamma text\ngamma text\nunique tail three"), // within-ONE-doc repeat
      (4L, "delta line\nepsilon line"),                  // nothing shared
      (5L, "shared nav\nshared footer"))                 // every line cut
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedLines(corpus,
        Dedup.lineDf(corpus, "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.size == 5, "removal must never drop rows")
    // cross-doc lines cut; order and blank line preserved
    assert(out(1L) == "alpha content one\n", out(1L))
    assert(out(2L) == "beta content two", out(2L))
    // a line repeated only WITHIN one doc is not duplicated (df = distinct docs)
    assert(out(3L) == "gamma text\ngamma text\nunique tail three", out(3L))
    // untouched doc is byte-identical
    assert(out(4L) == "delta line\nepsilon line", out(4L))
    // all lines cut -> empty string, row survives
    assert(out(5L) == "", out(5L))
  }

  test("incremental line-df: chunked arrival equals batch; promotion across chunks") {
    import spark.implicits._
    val docs6 = docs.where($"doc_id" < 60).select($"doc_id",
      concat(lit("hdr line\n"), $"text", lit("\ntail "),
        ($"doc_id" % 4).cast("string")).as("text"))
    val batch = Dedup.lineDf(docs6, "text")
    val inc = Dedup.lineDfIncrement(
      Dedup.lineDfIncrement(Dedup.lineDf(docs6.where($"doc_id" < 20), "text"),
        docs6.where($"doc_id" >= 20 && $"doc_id" < 40), "text"),
      docs6.where($"doc_id" >= 40), "text")
    assert(batch.exceptAll(inc).isEmpty && inc.exceptAll(batch).isEmpty,
      "chunked line-df must equal the single-batch build")
    // a line unique in chunk 1 ('tail 0' seen once) must be PROMOTED by
    // later chunks — removal off the incremental table equals batch removal
    val a = Dedup.removeDuplicatedLines(docs6, batch, "doc_id", "text")
    val b = Dedup.removeDuplicatedLines(docs6, inc, "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("incremental near-dup: ANY random id-ordered split reproduces single-batch") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text").where($"doc_id" < 150)
    val mh = Dedup.minhashBandsRowwise(docs, "doc_id", "text", 3, 8)
    val stolen = mh.join(mh.select($"doc_id".as("prior_id"), $"band", $"sig"),
        Seq("band", "sig"))
      .where($"prior_id" < $"doc_id").select($"doc_id").distinct()
    val batchKeepers = docs.join(stolen, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val maxId = 150L
    for (trial <- 0 until 3) {
      def rnd(i: Int): Long = graft.sources.PageGen.rnd(211L + trial, 0, i) >>> 1
      // 2..5 random cut points over the id range
      val cuts = (0L +: (0 until (2 + (rnd(0) % 4).toInt)).map(i => rnd(i + 1) % maxId)
        :+ maxId).distinct.sorted
      var index = Dedup.minhashBandsRowwise(docs.limit(0), "doc_id", "text", 3, 8)
      val got = scala.collection.mutable.ArrayBuffer[Long]()
      cuts.sliding(2).foreach { case Seq(lo, hi) =>
        if (hi > lo) {
          val (keepers, newIndex) = Dedup.incrementalNearDupKeepers(
            index, docs.where($"doc_id" >= lo && $"doc_id" < hi), "doc_id", "text", 3, 8)
          got ++= keepers.as[Long].collect()
          index = newIndex.localCheckpoint()
        }
      }
      assert(got.sorted.toSeq == batchKeepers,
        s"trial $trial cuts=$cuts: inc-only=${(got.toSet -- batchKeepers).take(5)} " +
          s"batch-only=${(batchKeepers.toSet -- got).take(5)}")
    }
  }

  test("minhash LSH with df cap still recalls planted near-dups") {
    import spark.implicits._
    val base = docs.where($"doc_id" < 40)
      .select($"doc_id", concat(substring($"text", 1, 60), lit(boiler)).as("text"))
    val twins = base.where($"doc_id" < 5)
      .select(($"doc_id" + 900).as("doc_id"), concat($"text", lit(" x")).as("text"))
    val pairs = Dedup.minhashLshPairs(base.union(twins), "doc_id", "text",
      n = 3, bands = 8, minJaccQ = 700, maxDf = 5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 900L)), s"twin $i missing: $pairs")
    }
  }

  test("block-permuted simhash: 8-block tables find exactly the 4-block pair set") {
    import spark.implicits._
    val corpus = docs.where($"doc_id" < 60).select($"doc_id", $"text")
      .union(docs.where($"doc_id" < 10)
        .select(($"doc_id" + 900).as("doc_id"), concat($"text", lit(" zz")).as("text")))
    def pairSet(nBlocks: Int) =
      Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 3, nBlocks = nBlocks)
        .select($"id_a", $"id_b", $"dist".cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // both configurations guarantee full recall at hamming <= 3, so the
    // filtered pair sets are identical — only the bucket-key width (and
    // thus in-bucket cost) differs
    val p4 = pairSet(4)
    val p8 = pairSet(8)
    assert(p4 == p8, s"4-block=${p4.size} vs 8-block=${p8.size}")
  }

  test("embedding near-dup multi-probe recovers single-plane-straddling twins") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    // plant a slightly-perturbed twin of each vector: cosine ~1, but the
    // LSH bucket can flip on any plane the original sits close to
    val twins = emb.where($"vec_id" < 40)
      .select(($"vec_id" + 5000).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i % 7 = 0, cast(x * 1.04 as float), x))")
          .as("embedding"))
    val corpus = emb.where($"vec_id" < 40).select($"vec_id", $"embedding").union(twins)
    def recall(probe: Boolean): Int = {
      val pairs = graft.operators.Dedup.embeddingNearDupPairs(corpus, "vec_id",
        "embedding", minCosQ = 990000L, nPlanes = 8, probeNeighbors = probe)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (0 until 40).count(i => pairs.contains((i.toLong, i + 5000L)))
    }
    val (noProbe, withProbe) = (recall(false), recall(true))
    assert(withProbe >= noProbe, s"probing lost pairs: $noProbe -> $withProbe")
    assert(withProbe >= 36, s"multi-probe recall too low: $withProbe/40 (no-probe: $noProbe)")
  }

  test("corpus-derived parameters grow with corpus size") {
    // SimHash: 16-bit keys fine at 10^6, wider keys demanded at 10^9+
    assert(Dedup.simhashBlocksForCorpus(1000000L, 3) == 4)
    assert(Dedup.simhashBlocksForCorpus(2000000000L, 3) == 8)
    // key width must be monotonically non-decreasing in corpus size
    val widths = Seq(1e4, 1e6, 1e8, 1e10, 1e12).map(n =>
      Dedup.simhashBlocksForCorpus(n.toLong, 3))
    assert(widths == widths.sorted)
    // embedding LSH planes: 2^planes buckets track corpus / targetPerBucket
    assert(Dedup.nPlanesForCorpus(1000L) == 8)         // floor
    assert(Dedup.nPlanesForCorpus(1000000000L) == 22)  // 1e9/256 = 2^22ish
    assert(Dedup.nPlanesForCorpus(Long.MaxValue / 2) == 30) // ceiling
    val planes = Seq(1e4, 1e6, 1e8, 1e10).map(n => Dedup.nPlanesForCorpus(n.toLong))
    assert(planes == planes.sorted)
  }

  test("splitLeakage: hand-computed matrix, distinct-shingle semantics, empty split") {
    import spark.implicits._
    val docs = Seq(
      ("train", "a b c"),      // train shingles: {a b, b c}
      ("val",   "a b x"),      // val: {a b, b x} -> 1 of 2 in train
      ("test",  "p q r"),      // test: {p q, q r}
      ("test",  "b c z"),      // + {b c, c z} -> 1 of 4 in train
      ("test",  "b c z")       // exact dup doc: distinct shingles unchanged
    ).toDF("split", "text")
    val got = Dedup.splitLeakage(docs, "text", "split", n = 2,
        trainLabel = "train", evalLabels = Seq("val", "test"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("val") == ((2L, 1L, 500L)), s"val row: ${got("val")}")
    assert(got("test") == ((4L, 1L, 250L)), s"test row: ${got("test")}")

    // an empty eval split still gets its row, with NULL leak_pm
    val withEmpty = Dedup.splitLeakage(docs, "text", "split", n = 2,
        trainLabel = "train", evalLabels = Seq("val", "dev"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(withEmpty("dev") == ((0L, 0L, -1L)), s"dev row: ${withEmpty("dev")}")

    // total containment reads 1000; zero overlap reads 0
    val extremes = Dedup.splitLeakage(Seq(
        ("train", "a b c d"), ("val", "b c d"), ("test", "x y z")
      ).toDF("split", "text"), "text", "split", n = 2,
        trainLabel = "train", evalLabels = Seq("val", "test"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(extremes == Map("val" -> 1000L, "test" -> 0L))
  }

  test("pairSetEval: hand-computed confusion counts, empty-side edges") {
    import spark.implicits._
    def pairs(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")
    val r = Dedup.pairSetEval(
        pairs((1L, 2L), (1L, 3L), (2L, 3L)),
        pairs((1L, 3L), (2L, 3L), (4L, 5L)).withColumn("extra", lit("ignored")))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getLong(3) == 666L && r.getLong(4) == 666L)
    // empty truth: recall undefined (NULL), precision 0
    val et = Dedup.pairSetEval(pairs(), pairs((1L, 2L))).collect().head
    assert((et.getLong(0), et.getLong(1), et.getLong(2)) == ((0L, 1L, 0L)))
    assert(et.isNullAt(3) && et.getLong(4) == 0L)
    // both empty: zero counts, both rates NULL
    val eb = Dedup.pairSetEval(pairs(), pairs()).collect().head
    assert((eb.getLong(0), eb.getLong(1), eb.getLong(2)) == ((0L, 0L, 0L)))
    assert(eb.isNullAt(3) && eb.isNullAt(4))
    // duplicated pair rows must not cross-multiply the counts
    val dup = Dedup.pairSetEval(
        pairs((1L, 2L), (1L, 2L), (1L, 2L), (3L, 4L)),
        pairs((1L, 2L), (1L, 2L)))
      .collect().head
    assert((dup.getLong(0), dup.getLong(1), dup.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("pairSetEval: more LSH bands never lose recall; verified LSH has precision 1000") {
    import spark.implicits._
    val corpus = docs.where($"doc_id" < 120)
    val truth = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccQ = 300, maxDf = 0)
    def recallAt(bands: Int): (Long, Long) = {
      val r = Dedup.pairSetEval(truth, Dedup.minhashLshPairs(corpus, "doc_id",
          "text", n = 3, bands = bands, minJaccQ = 300, maxDf = 0))
        .collect().head
      (r.getLong(3), if (r.isNullAt(4)) 1000L else r.getLong(4))
    }
    val (r1, p1) = recallAt(1)
    val (r8, p8) = recallAt(8)
    assert(r8 >= r1, s"recall fell with more bands: $r1 -> $r8")
    assert(p1 == 1000L && p8 == 1000L,
      "candidate-verified LSH must never emit a below-threshold pair")
  }

  test("splitLeakage plan: one shingle exchange + flag-max collapse, no self-join") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select(when($"doc_id" % 5 === 0, "val")
          .when($"doc_id" % 5 === 1, "test").otherwise("train").as("split"),
        $"text")
    val out = Dedup.splitLeakage(docs, "text", "split", n = 3,
      trainLabel = "train", evalLabels = Seq("val", "test"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"leakage must not plan a join:\n$p")
    assert(p.contains("partial_max") || p.contains("partial_first") ||
      p.contains("partial_sum") || p.contains("HashAggregate"),
      s"flag collapse not partial-aggregated:\n$p")
    // invariance: the matrix is a pure function of (split, text) content
    val shuffled = Dedup.splitLeakage(docs.repartition(13, $"text"), "text",
      "split", n = 3, trainLabel = "train", evalLabels = Seq("val", "test"))
    assert(out.collect().toSet == shuffled.collect().toSet)
    intercept[IllegalArgumentException](Dedup.splitLeakage(
      docs, "text", "split", 3, "train", Seq.empty))
    intercept[IllegalArgumentException](Dedup.splitLeakage(
      docs, "text", "split", 3, "train", Seq("train", "val")))
    intercept[IllegalArgumentException](Dedup.splitLeakage(
      docs, "text", "split", 3, "train", Seq("val", "val")))
  }
}
