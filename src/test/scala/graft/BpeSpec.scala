package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, BpeEncode}

/**
 * BPE tokenizer training + application (Bpe.scala).
 *
 * The learn loop is verified against an independent in-spec reference
 * implementation (plain Scala over a word→freq map — the textbook
 * Sennrich algorithm, written with none of the operator's machinery);
 * the codegen'd BpeEncode expression is verified against the builtin
 * replace-chain twin (the q97 oracle shape) on adversarial cases and
 * under fuzz, including merge lists LEARNED from the fuzz corpus so
 * chained merges (parents of parents) are exercised.
 */
class BpeSpec extends SparkSpec {
  import Bpe.Merge

  // ---- independent reference implementation (textbook BPE) ----

  /** Adjacent-pair counts of a symbolized vocab, every position. */
  private def refPairCounts(vocab: Map[Vector[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.sliding(2).collect { case Vector(a, b) => ((a, b), f) }
    }.groupMapReduce(_._1)(_._2)(_ + _)

  /** One left-to-right non-overlapping merge pass over one word. */
  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(freqs: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      freqs.groupMapReduce { case (w, _) => w.map(_.toString).toVector }(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) done = true
      else {
        // tie-break in UTF-8 BYTE order — the order Spark's UTF8String
        // sorts by (≠ Java UTF-16 compareTo on supplementary planes)
        import scala.math.Ordering.Implicits._
        def u8(s: String): Seq[Int] = s.getBytes("UTF-8").toSeq.map(_ & 0xff)
        val ((a, b), c) = pc.minBy { case ((a, b), c) => (-c, u8(a), u8(b)) }
        if (c < 2) done = true
        else {
          out += ((a, b, c))
          vocab = vocab.toSeq.map { case (s, f) => (refApply(s, a, b), f) }
            .groupMapReduce(_._1)(_._2)(_ + _)
          r += 1
        }
      }
    }
    out.result()
  }

  /** Reference encode: apply merges in rank order, one pass each. */
  private def refEncode(text: String, merges: Seq[(String, String)]): String =
    text.split("\\s+").filter(_.nonEmpty).map { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => refApply(s, a, b)
      }.mkString(" ")
    }.mkString(" ")

  private def docsDf(texts: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val corpus = Seq(
    "the sort order sort sort merge",
    "order order the scan sort",
    "a the merge scan scan order",
    "sort the order merge merge a a")

  test("wordFreqs: one corpus pass, empties dropped, matches reference counts") {
    val wf = Bpe.wordFreqs(docsDf(corpus :+ "  " :+ ""), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    assert(wf === ref)
  }

  test("pairCounts round 0 == reference adjacent-position counts") {
    val wf = Bpe.wordFreqs(docsDf(corpus), "text")
    val got = Bpe.pairCounts(
        wf.select(Bpe.render(col("word")).as("r"), col("freq")), "r", "freq")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val refFreqs = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val ref = refPairCounts(refFreqs.map { case (w, f) =>
      w.map(_.toString).toVector -> f })
    assert(got === ref)
    // repeated chars count every adjacent position: 'aaa' → (a,a) x2
    val got2 = Bpe.pairCounts(
        docsDf(Seq("aaa")).select(Bpe.render(col("text")).as("r"), lit(1L).as("f")),
        "r", "f")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got2 === Map(("a", "a") -> 2L))
    // U+2028 is not Java \s, so it can sit INSIDE a word — render must
    // wrap it like any other char (Java '.' without (?s) skips it)
    val got3 = Bpe.pairCounts(
        docsDf(Seq("a\u2028b")).select(Bpe.render(col("text")).as("r"), lit(1L).as("f")),
        "r", "f")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got3 === Map(("a", "\u2028") -> 1L, ("\u2028", "b") -> 1L))
  }

  test("learn == reference learner, merges in deterministic rank order") {
    val wf = Bpe.wordFreqs(docsDf(corpus), "text")
    val got = Bpe.learn(wf, "word", "freq", numMerges = 12)
    val refFreqs = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val ref = refLearn(refFreqs, 12)
    assert(got.map(m => (m.a, m.b, m.count)) === ref)
    assert(got.map(_.rank) === got.indices)
    // early stop: once no pair reaches weight 2 the list ends
    assert(got.size <= 12)
  }

  test("learn is partitioning-invariant (same merges at 1 and 7 partitions)") {
    val wf = Bpe.wordFreqs(docsDf(corpus), "text")
    val a = Bpe.learn(wf.coalesce(1), "word", "freq", 6)
    val b = Bpe.learn(wf.repartition(7), "word", "freq", 6)
    assert(a === b)
  }

  test("BpeEncode expression == replace-chain twin == reference on adversarial cases") {
    val merges = Seq(Merge("s", "o", 0L, 0), Merge("r", "t", 0L, 1),
      Merge("so", "rt", 0L, 2), Merge("e", "r", 0L, 3), Merge("o", "r", 0L, 4),
      Merge("a", "a", 0L, 5), Merge("aa", "aa", 0L, 6))
    val cases = Seq(
      "the sort order sorts resort", // chained so+rt → sort inside longer words
      "sort", "so rt", "s o r t",    // merge only within words, never across
      "aaa aaaa aaaaa aaaaaaaa",     // overlapping self-pairs, recursive aa+aa
      "  leading and   trailing  ", // edge + run whitespace
      "", " ", "x", "rt so er or",
      "unrelated words zzz qq")
    val df = docsDf(cases)
    val got = df.select(col("doc_id"),
        Bpe.encode(col("text"), merges).as("e"),
        Bpe.encodeChain(col("text"), merges).as("c"))
      .orderBy("doc_id").collect()
    got.zip(cases).foreach { case (r, t) =>
      assert(r.getString(1) === r.getString(2), s"expr vs chain on '$t'")
      assert(r.getString(1) === refEncode(t, merges.map(m => (m.a, m.b))),
        s"expr vs reference on '$t'")
    }
    // greedy left-to-right on self-pairs: aaaa → [aa,aa] → [aaaa]
    val m = got.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(4L) === "aa a aaaa aaaa a aaaa aaaa")
  }

  test("fuzz: expression == chain == reference under learned merge tables") {
    val rnd = new scala.util.Random(20260819L)
    val alphabet = "abcde"
    def word(): String =
      (0 until (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 8).foreach { round =>
      val texts = (0 until 40).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => word())
          .mkString(if (rnd.nextBoolean()) " " else "  ")
      }
      val wf = Bpe.wordFreqs(docsDf(texts), "text")
      val merges = Bpe.learn(wf, "word", "freq", 1 + rnd.nextInt(8))
      // learned merges match the reference learner on the same corpus
      val refFreqs = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      assert(merges.map(m => (m.a, m.b, m.count)) === refLearn(refFreqs, merges.size max 1)
        .take(merges.size), s"round $round learn")
      if (merges.nonEmpty) {
        val got = docsDf(texts).select(col("doc_id"),
            Bpe.encode(col("text"), merges).as("e"),
            Bpe.encodeChain(col("text"), merges).as("c"))
          .orderBy("doc_id").collect()
        got.zip(texts).foreach { case (r, t) =>
          assert(r.getString(1) === r.getString(2), s"round $round expr vs chain on '$t'")
          assert(r.getString(1) === refEncode(t, merges.map(m => (m.a, m.b))),
            s"round $round expr vs reference on '$t'")
        }
      }
    }
  }

  test("merge table round-trips through its persistable DataFrame form") {
    val wf = Bpe.wordFreqs(docsDf(corpus), "text")
    val merges = Bpe.learn(wf, "word", "freq", 6)
    assert(merges.nonEmpty)
    val back = Bpe.mergesFrom(Bpe.mergesDf(spark, merges)
      .orderBy(rand(7))) // storage order must not matter
    assert(back === merges)
  }

  test("BpeEncode's generated code actually compiles (no silent interpreted fallback)") {
    // whole-stage codegen falls back to interpreted eval on Janino
    // compile errors by default, which value-checks can't see — disable
    // the fallback so a broken doGenCode (e.g. a generic cast Janino
    // can't parse) fails loudly here
    val merges = Seq(Merge("s", "o", 0L, 0), Merge("so", "r", 0L, 1))
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val out = docsDf(Seq("sorrow sor so")).select(
        Bpe.encode(col("text"), merges).as("e")).collect()
      assert(out(0).getString(0) === "sor r o w sor so")
    }
  }

  test("BpeEncode is null-intolerant and type-checked") {
    val merges = Seq(Merge("a", "b", 0L, 0))
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b ab"))).toDF("id", "text")
    val out = df.select(col("id"), Bpe.encode(col("text"), merges).as("e"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) === "a b ab")
    val bad = BpeEncode(
      org.apache.spark.sql.graftshim.Bridge.expression(col("id")),
      merges.map(m => (m.a, m.b)))
    assert(bad.checkInputDataTypes().isFailure)
  }
}
