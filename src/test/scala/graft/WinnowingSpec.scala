package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Winnowing local fingerprints (Schleimer et al. 2003) — the
 * `WinnowHashes` expression and `Dedup.winnowingFingerprints`.
 *
 * Verified against an independent in-spec reference (naive per-window
 * rightmost-min scan over independently-computed md5 shingle hashes),
 * plus the paper's detection guarantee on planted shared runs, the
 * short-doc single-window rule, density bounds, and a codegen-compile
 * pin (fallback=false).
 */
class WinnowingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent reference: hashes, then a naive O(L·w) per-window scan
    * selecting the rightmost minimal hash; distinct selections.
    * Tokenization mirrors the operator's contract exactly: trim strips
    * 0x20 ONLY (UTF8String.trim semantics, not String.trim's <= 0x20),
    * split keeps interior empties, empty docs yield nothing. */
  private def refWinnow(text: String, n: Int, w: Int): Set[(Long, String)] = {
    val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = t.split("\\s+", -1)
    if (toks.length < n) return Set.empty
    if (toks.length == 1 && toks(0).isEmpty) return Set.empty
    val hs = (0 to toks.length - n)
      .map(i => md5hex(toks.slice(i, i + n).mkString(" ")))
    val win = math.min(w, hs.length)
    (0 to hs.length - win).map { ws =>
      val frame = hs.slice(ws, ws + win)
      val mh = frame.min
      val pos = ws + frame.lastIndexOf(mh)
      (pos.toLong, mh)
    }.toSet
  }

  private def docsDf(texts: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def run(texts: Seq[String], n: Int, w: Int): Map[Long, Set[(Long, String)]] =
    Dedup.winnowingFingerprints(docsDf(texts), "doc_id", "text", n, w)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getString(2))).toSet
      }

  test("operator == independent reference on hand + fuzz cases") {
    val hand = Seq(
      "a b c a b c a b x",        // repeated shingles → rightmost-min ties
      "x y z",                    // exactly one window (toks == n)
      "a b",                      // toks < n → nothing
      "",                         // empty
      "w w w w w w w w",          // all-equal hashes → rightmost each window
      "\ta b c d e",              // tab-led: 0x20-only trim keeps the
                                  // leading empty token (SpanHashes parity)
      "the quick brown fox jumps over the lazy dog")
    val got = run(hand, n = 3, w = 4)
    hand.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) === refWinnow(t, 3, 4), s"'$t'")
    }
    // empty/whitespace-only docs emit nothing even at n = 1 (no shared
    // md5("") fingerprint)
    assert(run(Seq("", "   "), n = 1, w = 2).values.forall(_.isEmpty))
    val rnd = new scala.util.Random(100L)
    val vocab = Vector("a", "b", "c", "d", "ee", "ff")
    (0 until 6).foreach { round =>
      val n = 1 + rnd.nextInt(3); val w = 1 + rnd.nextInt(5)
      val texts = (0 until 30).map(_ =>
        (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val g = run(texts, n, w)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(g.getOrElse(i.toLong, Set.empty) === refWinnow(t, n, w),
          s"round $round n=$n w=$w on '$t'")
      }
    }
  }

  test("detection guarantee: shared run of w+n-1 tokens => shared fingerprint") {
    val rnd = new scala.util.Random(200L)
    val n = 3; val w = 4
    (0 until 20).foreach { round =>
      // unique-vocabulary halves so only the planted run is shared
      val run1 = (0 until (w + n - 1)).map(k => s"shared${round}_$k").mkString(" ")
      val docA = (0 until 20).map(k => s"a${round}_$k").mkString(" ") +
        " " + run1 + " " + (0 until 7).map(k => s"aa${round}_$k").mkString(" ")
      val docB = (0 until (3 + rnd.nextInt(15))).map(k => s"b${round}_$k").mkString(" ") +
        " " + run1 + " " + (0 until 11).map(k => s"bb${round}_$k").mkString(" ")
      val g = run(Seq(docA, docB), n, w)
      val shared = g(0L).map(_._2) intersect g(1L).map(_._2)
      assert(shared.nonEmpty, s"round $round: guarantee violated")
    }
  }

  test("short docs winnow as one window; density stays ~2/(w+1)") {
    // 5 windows with w=8 → exactly one fingerprint
    val g = run(Seq("t1 t2 t3 t4 t5 t6 t7"), n = 3, w = 8)
    assert(g(0L).size === 1)
    // density: random 400-token doc, w=4 → expected ~2/(w+1)=40% of
    // windows; allow a wide band but pin both directions
    val rnd = new scala.util.Random(300L)
    val doc = (0 until 400).map(_ => s"v${rnd.nextInt(5000)}").mkString(" ")
    val nWin = 400 - 3 + 1
    val sz = run(Seq(doc), 3, 4)(0L).size
    assert(sz > nWin / 5 && sz < nWin * 3 / 5, s"density $sz / $nWin windows")
  }

  test("winnowing fingerprints are span hashes (the two index families compose)") {
    val df = docsDf(Seq("p q r s t u v w"))
    val spans = Dedup.spanHashRows(df, "doc_id", "text", 3)
      .collect().map(_.getString(1)).toSet
    val fps = run(Seq("p q r s t u v w"), 3, 4)(0L).map(_._2)
    assert(fps.subsetOf(spans))
  }

  test("generated code compiles (fallback=false)") {
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val out = docsDf(Seq("m n o p q")).select(
        Dedup.winnow_hashes(col("text"), 3, 4).as("f")).collect()
      assert(out(0).getSeq[String](0).nonEmpty)
    }
  }
}
