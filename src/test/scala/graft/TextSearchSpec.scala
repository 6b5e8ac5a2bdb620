package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, TextSearch}

/** The text-serving/prep plane added in round 4: BM25 over the postings
  * index, benchmark-contamination tagging, token-window chunking. */
class TextSearchSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("sf0.001/documents.parquet")).cache()

  test("postings built in increments equal the single-batch build") {
    import spark.implicits._
    val batch = TextSearch.postingsIncrement(docs, "doc_id", "text")
    val chunked = TextSearch.postingsIncrement(
        docs.where($"doc_id" % 3 === 0), "doc_id", "text")
      .unionByName(TextSearch.postingsIncrement(
        docs.where($"doc_id" % 3 === 1), "doc_id", "text"))
      .unionByName(TextSearch.postingsIncrement(
        docs.where($"doc_id" % 3 === 2), "doc_id", "text"))
    assert(batch.exceptAll(chunked).isEmpty && chunked.exceptAll(batch).isEmpty)
  }

  test("bm25: rare-term doc outranks common-term doc; tf saturates, not dominates") {
    import spark.implicits._
    // 20 background docs of common terms + one doc with the rare term once,
    // one spamming it. Query = the rare term.
    val bg = (0L until 20L).map(i => (i, "alpha beta gamma delta " * 5))
    val corpus = (bg :+ (100L, "alpha beta needle gamma delta " + "alpha " * 15)
      :+ (101L, ("needle " * 20).trim)).toDF("doc_id", "text")
    val postings = TextSearch.postingsIncrement(corpus, "doc_id", "text")
    val qt = Seq((1L, "needle")).toDF("request_id", "term")
    val top = TextSearch.bm25TopK(qt, postings,
        TextSearch.termDf(postings), TextSearch.statsOf(postings), k = 5)
      .orderBy($"rk").select($"doc_id", $"score_q").as[(Long, Long)].collect()
    // only the two needle docs score at all
    assert(top.map(_._1).toSet == Set(100L, 101L), top.toSeq.toString)
    // the spammer wins on tf... but saturated: < (k1+1)/sat(1) ≈ 3.2× the
    // single occurrence, NOT 20×. (doc 101 is also much shorter than
    // avgdl, which raises its sat further — still far below linear tf.)
    val s = top.toMap
    assert(s(101L) > s(100L), s"tf should still order: $s")
    assert(s(101L) < 4 * s(100L), s"tf must saturate, got ${s(101L)} vs ${s(100L)}")
  }

  test("bm25: query served off the index never rescans corpus text (plan)") {
    import spark.implicits._
    // corpus text lives at a dedicated path, the index artifacts are
    // persisted (parquet round-trip, as a maintenance job would leave them)
    val dir = java.nio.file.Files.createTempDirectory("bm25-index").toString
    docs.write.parquet(s"$dir/corpus-text.parquet")
    val corpus = spark.read.parquet(s"$dir/corpus-text.parquet")
    TextSearch.postingsIncrement(corpus, "doc_id", "text")
      .write.parquet(s"$dir/postings.parquet")
    val postings = spark.read.parquet(s"$dir/postings.parquet")
    TextSearch.termDf(postings).write.parquet(s"$dir/df.parquet")
    TextSearch.statsOf(postings).write.parquet(s"$dir/stats.parquet")
    val qt = TextSearch.queryTerms(docs.where($"doc_id" < 3), "doc_id", "text", 6)
    val plan = TextSearch.bm25TopK(qt, spark.read.parquet(s"$dir/postings.parquet"),
        spark.read.parquet(s"$dir/df.parquet"),
        spark.read.parquet(s"$dir/stats.parquet"), k = 5)
      .queryExecution.executedPlan.toString
    // serving touches ONLY the index artifacts — corpus text never rescanned
    assert(!plan.contains("corpus-text.parquet"),
      s"corpus text rescanned at query time:\n$plan")
    assert(plan.contains("postings.parquet"))
  }

  test("contamination: planted benchmark excerpt flags; clean docs do not") {
    import spark.implicits._
    val bench = Seq((1000L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // doc 1 embeds the full benchmark text inside noise; doc 2 is clean
    val corpus = docs.where($"doc_id" < 30).select($"doc_id",
      when($"doc_id" === 1,
        concat(substring($"text", 1, 40),
          lit(" the quick brown fox jumps over the lazy dog tonight "),
          substring($"text", 41, 40)))
        .otherwise($"text").as("text"))
    val got = Dedup.contaminationTag(corpus, bench, "doc_id", "text",
        "doc_id", "text", n = 3, minContainQ = 500L)
      .select($"doc_id", $"bench_id", $"contain_q")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(1L), got.toSeq.toString)
    assert(got.head._3 == 1000L, s"full containment expected: ${got.head}")
  }

  test("span decontamination: exact 13-gram windows, boundaries, short docs") {
    import spark.implicits._
    val sent = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13" // exactly 13
    val bench = Seq((1000L, s"benchmark preamble $sent and a closing line"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"noise before $sent noise after"),          // verbatim hit
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),   // 12 of 13: no window
      (3L, s"${sent.replace("w7", "W7")} padded out to thirteen plus tokens"),
      (4L, "short doc"),                                 // < 13 tokens: absent
      (5L, sent))                                        // the window IS the doc
      .toDF("doc_id", "text")
    val got = Dedup.decontaminateBySpans(corpus, bench,
        "doc_id", "text", "doc_id", "text", n = 13)
      .select($"doc_id", $"n_spans", $"hit_spans", $"tainted")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 3L, 5L), got.toString) // 2 & 4: no window
    assert(got(1L)._4 && got(1L)._3 == 1L, got(1L).toString)
    assert(!got(3L)._4, s"case-changed token must not hit: ${got(3L)}")
    assert(got(5L) == ((5L, 1L, 1L, true)), got(5L).toString)
    // plan: bench hashes broadcast, corpus scanned+hashed exactly ONCE
    val plan = Dedup.decontaminateBySpans(corpus, bench,
        "doc_id", "text", "doc_id", "text", n = 13)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val nScans = "LocalTableScan".r.findAllIn(plan).size
    assert(nScans == 2, s"expected 2 scans (corpus once, bench once):\n$plan")
    // a window straddling two bench docs must NOT exist: doc boundaries hold
    val splitBench = Seq((1L, "w1 w2 w3 w4 w5 w6 w7"),
      (2L, "w8 w9 w10 w11 w12 w13")).toDF("doc_id", "text")
    val none = Dedup.decontaminateBySpans(Seq((9L, sent)).toDF("doc_id", "text"),
      splitBench, "doc_id", "text", "doc_id", "text", n = 13)
    assert(none.where($"tainted").isEmpty, "cross-bench-doc window leaked")
  }

  test("chunking: coverage, overlap, tail, and degenerate docs") {
    import spark.implicits._
    val size = 16; val stride = 12
    val chunks = TextAnalysis.chunkByTokens(docs, "doc_id", "text", size, stride)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).toSeq }
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == texts.keySet)
    for ((id, cs) <- chunks) {
      val toks = texts(id).trim.split("\\s+", -1).toSeq
      val n = toks.size
      // chunk count formula
      val want = 1 + math.max(0, (n - size + stride - 1) / stride)
      assert(cs.size == want, s"doc $id: ${cs.size} chunks, want $want (n=$n)")
      // each chunk is exactly the token slice it claims
      for ((c, i) <- cs.zipWithIndex) {
        val exp = toks.slice(i * stride, i * stride + size).mkString(" ")
        assert(c == exp, s"doc $id chunk $i mismatch")
      }
      // coverage: stride <= size means the last chunk reaches the last token
      assert((cs.size - 1) * stride + size >= n)
    }
    // whitespace-only and sub-stride docs: exactly one chunk
    val tiny = Seq((1L, "   "), (2L, "one two")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(tiny, "doc_id", "text", size, stride)
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "", 2L -> "one two"))
    // stride == size: disjoint exact partition
    val dj = TextAnalysis.chunkByTokens(tiny, "doc_id", "text", 1, 1)
      .where($"doc_id" === 2).orderBy($"chunk_idx")
      .select($"chunk_text").as[String].collect().toSeq
    assert(dj == Seq("one", "two"))
  }

  test("positional postings built in increments equal the single-batch build") {
    import spark.implicits._
    val batch = TextSearch.positionsIncrement(docs, "doc_id", "text")
    val chunked = TextSearch.positionsIncrement(
        docs.where($"doc_id" % 2 === 0), "doc_id", "text")
      .unionByName(TextSearch.positionsIncrement(
        docs.where($"doc_id" % 2 === 1), "doc_id", "text"))
    assert(batch.exceptAll(chunked).isEmpty && chunked.exceptAll(batch).isEmpty)
  }

  test("compact positional index: smaller by construction, chunked ≡ batch, serving ≡ row layout") {
    import spark.implicits._
    val rowIdx = TextSearch.positionsIncrement(docs, "doc_id", "text")
    val compact = TextSearch.positionsCompactIncrement(docs, "doc_id", "text")
    // the size lever is real: ~distinct-terms rows instead of ~dl rows
    val rowCnt = rowIdx.count(); val cCnt = compact.count()
    assert(cCnt < rowCnt, s"compact $cCnt !< row $rowCnt")
    // exact row-for-row: exploding the arrays back gives the row layout
    val reExploded = compact.select($"doc_id", $"term",
      explode($"positions").as("pos"))
    assert(reExploded.exceptAll(rowIdx.select($"doc_id", $"term", $"pos")).isEmpty &&
      rowIdx.select($"doc_id", $"term", $"pos").exceptAll(reExploded).isEmpty)
    // chunked build equals single-batch
    val chunked = TextSearch.positionsCompactIncrement(
        docs.where($"doc_id" % 2 === 0), "doc_id", "text")
      .unionByName(TextSearch.positionsCompactIncrement(
        docs.where($"doc_id" % 2 === 1), "doc_id", "text"))
    assert(compact.exceptAll(chunked).isEmpty && chunked.exceptAll(compact).isEmpty)
    // and phrase serving off it equals the row layout
    val reqs = docs.where($"doc_id" < 5)
      .select($"doc_id".as("req_id"),
        concat_ws(" ", slice(split(trim($"text"), "\\s+"), 1, 3)).as("phrase"))
    val qt = TextSearch.phraseQueryTerms(reqs, "req_id", "phrase")
    val viaCompact = TextSearch.phraseMatchesCompact(qt, compact)
    val viaRows = TextSearch.phraseMatches(qt, rowIdx)
    assert(viaCompact.exceptAll(viaRows).isEmpty &&
      viaRows.exceptAll(viaCompact).isEmpty && viaRows.count() > 0)
  }

  test("phrase search: exact adjacency, overlapping occurrences, repeated words") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b a"),        // "a b a" at 1 and 3 (overlap); "b a b" at 2
      (2L, "x y z x"),          // words of "x z" present but never adjacent
      (3L, "a b c a b c"),      // "a b c" at 1 and 4, disjoint
      (4L, "b a")               // phrase longer than prefix present
    ).toDF("doc_id", "text")
    val positions = TextSearch.positionsIncrement(corpus, "doc_id", "text")
    val reqs = Seq((100L, "a b a"), (101L, "x z"), (102L, "a b c"), (103L, "b a b"))
      .toDF("req_id", "phrase")
    val got = TextSearch.phraseMatches(
        TextSearch.phraseQueryTerms(reqs, "req_id", "phrase"), positions)
      .select($"request_id", $"doc_id", $"n_occ", $"first_pos")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (100L, 1L, 2L, 1L),  // overlapping starts 1,3 both count
      (102L, 3L, 2L, 1L),
      (103L, 1L, 1L, 2L))  // "b a b" once at 2; NOT in doc 4 ("b a" only)
    assert(got == want, got.toString) // 101 ("x z") matches nothing
  }

  test("phrase search: results invariant under index chunking and partitioning") {
    import spark.implicits._
    val reqs = docs.where($"doc_id" < 5)
      .select($"doc_id".as("req_id"),
        concat_ws(" ", slice(split(trim($"text"), "\\s+"), 1, 3)).as("phrase"))
    val qt = TextSearch.phraseQueryTerms(reqs, "req_id", "phrase")
    val whole = TextSearch.phraseMatches(qt,
      TextSearch.positionsIncrement(docs, "doc_id", "text"))
    val pieces = TextSearch.phraseMatches(qt,
      TextSearch.positionsIncrement(docs.where($"doc_id" % 3 === 0), "doc_id", "text")
        .unionByName(TextSearch.positionsIncrement(
          docs.where($"doc_id" % 3 =!= 0), "doc_id", "text"))
        .repartition(11))
    assert(whole.exceptAll(pieces).isEmpty && pieces.exceptAll(whole).isEmpty)
    // every request's own document is among its matches (phrase = its prefix)
    val self = whole.where($"request_id" === $"doc_id").count()
    assert(self == reqs.count(), s"self matches $self")
  }
}
