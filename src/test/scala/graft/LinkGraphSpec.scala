package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

class LinkGraphSpec extends SparkSpec {

  test("outlinkUrls: quote styles, case, relative and non-http skipped") {
    import spark.implicits._
    val html =
      """<html><body>
        |<a href="https://a.example.com/p?x=1">one</a>
        |<A HREF='http://b.example.com:8080/q'>two</A>
        |<a class="x" href="https://a.example.com/other">repeat host</a>
        |<a href="/relative/skip">rel</a>
        |<a href="ftp://files.example.com/f">ftp</a>
        |<a name="anchor-no-href">none</a>
        |<a data-xhref="https://phantom.example.com/x">suffix-attr, NOT a link</a>
        |</body></html>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(LinkGraph.outlinkUrls(encode(col("h"), "UTF-8")).as("u"))
      .as[Seq[String]].head()
    assert(got == Seq(
      "https://a.example.com/p?x=1",
      "http://b.example.com:8080/q",
      "https://a.example.com/other"), got.toString)
  }

  test("hostOf: lowercase, port and userinfo stripped, null on garbage") {
    import spark.implicits._
    val cases = Seq(
      "https://WWW.Example.COM/path" -> "www.example.com",
      "http://h.example.com:8080/q" -> "h.example.com",
      "https://user:pw@secret.example.com/x" -> "secret.example.com",
      "not a url" -> null,
      "/relative" -> null)
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), LinkGraph.hostOf(col("u")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    cases.zip(got).foreach { case (want, have) =>
      assert(want._2 === have._2, s"input: '${want._1}'")
    }
  }

  test("hostEdges: self-links dropped, multiplicity counted across pages") {
    import spark.implicits._
    def page(links: String*): String =
      links.map(u => s"""<a href="$u">l</a>""").mkString("<html>", " ", "</html>")
    val pages = Seq(
      ("a.com", page("https://b.com/1", "https://b.com/2", "https://a.com/self")),
      ("a.com", page("https://b.com/3", "https://c.com/1")),
      ("b.com", page("https://c.com/2")))
      .toDF("host", "raw")
      .select(col("host"), encode(col("raw"), "UTF-8").as("html"))
    val got = LinkGraph.hostEdges(pages, "html", "host")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a.com", "b.com", 3L), ("a.com", "c.com", 1L),
      ("b.com", "c.com", 1L)), got.toString)
  }

  test("pagerankInt: hand-computed integer ranks on a weighted 3-cycle") {
    import spark.implicits._
    // A ->2 B, A ->1 C, B -> C, C -> A; deg A=3, B=1, C=1
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L),
      ("C", "A", 1L)).toDF("src_host", "dst_host", "n_links")
    // iter 1: c(A)=1000000, c(B)=(1e6*2) div 3=666666, c(C)=333333+1000000
    //   r1 = A 1000000, B 716666, C 1283333
    // iter 2: c(A)=1283333, c(B)=666666, c(C)=333333+716666
    //   r2 = A 1240833, B 716666, C 1042499
    val got = LinkGraph.pagerankInt(edges, iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1240833L, "B" -> 716666L, "C" -> 1042499L),
      got.toString)
  }

  test("pagerankInt: dangling sink keeps base mass flowing, source decays") {
    import spark.implicits._
    val edges = Seq(("X", "Y", 1L)).toDF("src_host", "dst_host", "n_links")
    val got = LinkGraph.pagerankInt(edges, iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("X" -> 150000L, "Y" -> 1000000L), got.toString)
  }

  test("anchorIndex: aligned url/anchor pairs, trim, empty anchors kept") {
    import spark.implicits._
    val pages = Seq(
      ("a.com",
        """<html><a href="https://b.com/1"> first link </a>
          |<A HREF='https://c.com/2'>second</A>
          |<a href="https://b.com/3"></a>
          |<a href="https://a.com/self">self skipped</a>
          |<a href="/rel">rel skipped</a></html>""".stripMargin),
      ("b.com", """<a href="https://c.com/x">second</a>"""))
      .toDF("host", "raw")
      .select(col("host"), encode(col("raw"), "UTF-8").as("html"))
    val got = LinkGraph.anchorIndex(pages, "html", "host")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("b.com", "first link", 1L),
      ("c.com", "second", 2L),
      ("b.com", "", 1L)), got.toString)
  }

  test("edgesIncrement: two disjoint epochs fold to the one-pass table") {
    import spark.implicits._
    def page(links: String*): String =
      links.map(u => s"""<a href="$u">l</a>""").mkString("<html>", " ", "</html>")
    val all = Seq(
      ("a.com", page("https://b.com/1", "https://c.com/1")),
      ("a.com", page("https://b.com/2")),
      ("b.com", page("https://c.com/2", "https://a.com/x")),
      ("c.com", page("https://a.com/y")))
      .toDF("host", "raw")
      .select(col("host"), encode(col("raw"), "UTF-8").as("html"))
    val Array(e0, e1) = all.randomSplit(Array(0.5, 0.5), seed = 81)
    val merged = LinkGraph.edgesIncrement(
        LinkGraph.hostEdges(e0, "html", "host"), e1, "html", "host")
      .as[(String, String, Long)].collect().toSet
    val onePass = LinkGraph.hostEdges(all, "html", "host")
      .as[(String, String, Long)].collect().toSet
    assert(merged == onePass, s"merged=$merged onePass=$onePass")
  }

  test("generated corpus: one absolute outlink per page, self-links dropped") {
    import graft.sources.{PageGen, PageGenConfig}
    val cfg = PageGenConfig(nPages = 2000L, nHosts = 20, parallelism = 4)
    val pages = PageGen.rawPages(spark, cfg).toDF()
    val total = LinkGraph.hostEdges(pages, "html", "host")
      .agg(sum(col("n_links"))).collect()(0).getLong(0)
    // independent derivation straight from the generator arithmetic
    val bounds = PageGen.hostBoundaries(cfg)
    val expected = (0L until cfg.nPages).count { id =>
      PageGen.hostName(PageGen.hostOfId(bounds, id)) !=
        PageGen.hostName(PageGen.draw(cfg.seed, 17, id, 0, cfg.nHosts))
    }.toLong
    assert(total == expected, s"total=$total expected=$expected")
    assert(total > 0L)
  }

  test("pagerankInt: bit-identical across input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    val edges = (1 to 400).map { _ =>
      val a = "h" + rnd.nextInt(30); val b = "h" + rnd.nextInt(30)
      (a, b, (rnd.nextInt(3) + 1).toLong)
    }.toDF("src_host", "dst_host", "n_links")
      .groupBy("src_host", "dst_host")
      .agg(sum("n_links").as("n_links"))
      .where(col("src_host") =!= col("dst_host"))
    val one = LinkGraph.pagerankInt(edges.repartition(1), iters = 3)
      .as[(String, Long)].collect().sorted.toSeq
    val many = LinkGraph.pagerankInt(edges.repartition(13), iters = 3)
      .as[(String, Long)].collect().sorted.toSeq
    assert(one == many)
    assert(one.nonEmpty && one.map(_._2).sum > 0)
  }

  test("hostOf: builtin rewrite ≡ the 3-regex reference on adversarial urls") {
    import spark.implicits._
    val base = Seq(
      "https://WWW.Example.COM/path", "http://h.example.com:8080/q",
      "https://user:pw@secret.example.com/x", "not a url", "/relative",
      "", "http://", "http:///x", "x://host", "1http://x",
      "http://a://b/c", "http://a@b@c/x", "http://@h/x", "http://@/x",
      "http://h:/x", "http://h:80:90/p", "http://h:8a0", "http://[::1]:80/",
      "http://::80", "http://host?q=1#f", "http://host#f?q", "http://host:",
      "ht+t.p-x://Host.Name:443", "HTTPS://UP@HO:12?x", "http://h#",
      "scheme://", "a://b?", "http://host:08", "http://h:0",
      "http://xn--bcher-kva.example:65536/p")
    // plus a deterministic fuzz sweep over url-ish character soup
    val rnd = new scala.util.Random(42)
    val alphabet = "aB:/@?#.019+-%_~ \t\n"
    val fuzz = (1 to 3000).map { _ =>
      val n = rnd.nextInt(24)
      val pre = if (rnd.nextBoolean()) "http://" else ""
      pre + (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = (base ++ fuzz).toDF("u")
      .select(col("u"), LinkGraph.hostOf(col("u")).as("got"),
        LinkGraph.hostOfRef(col("u")).as("want"))
    val diff = df.where(not(col("got") <=> col("want"))).collect()
    assert(diff.isEmpty, diff.take(10).mkString("; "))
  }
}
