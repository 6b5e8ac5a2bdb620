package graft

import graft.functions.HtmlText
import graft.functions.ExtractHtmlText.extract_html_text
import graft.sources.{PageGen, PageGenConfig}

class PageGenSpec extends SparkSpec {

  private val cfg = PageGenConfig(nPages = 2000L, nHosts = 20, parallelism = 8)

  test("generator is deterministic and partition-independent") {
    import spark.implicits._
    val a = PageGen.genPages(spark, cfg).collect().sortBy(_.url)
    val b = PageGen.genPages(spark, cfg.copy(parallelism = 3)).collect().sortBy(_.url)
    assert(a.length == 2000)
    assert(a.map(_.url).sameElements(b.map(_.url)))
    assert(a.zip(b).forall { case (x, y) =>
      java.util.Arrays.equals(x.html, y.html) && x.warc_ts == y.warc_ts &&
        x.expected_text == y.expected_text
    })
  }

  test("per-row invariant: extract(html) is byte-identical to expected text per url") {
    val rows = PageGen.genPages(spark, cfg).collect()
    rows.foreach { g =>
      val got = HtmlText.extract(g.html)
      assert(got == g.expected_text, s"mismatch for ${g.url}\n got: $got\n exp: ${g.expected_text}")
    }
  }

  test("catalyst expression matches the scala function (interpreted + codegen)") {
    import spark.implicits._
    val ds = PageGen.genPages(spark, cfg.copy(nPages = 200L))
    val viaExpr = ds.select($"url", extract_html_text($"html").as("t"), $"expected_text")
      .collect()
    viaExpr.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"expr mismatch for ${r.getString(0)}")
    }
  }

  test("zipf skew: hottest host dominates; sessions have closed-form gaps") {
    val bounds = PageGen.hostBoundaries(cfg)
    val hot = bounds(1) - bounds(0)
    assert(hot > cfg.nPages / cfg.nHosts, "host 0 should be hot under zipf")
    // session gap structure for the hot host
    val l = PageGen.pagesPerSession(cfg, 0)
    val ts = (0L until math.min(hot, 200L)).map(k => PageGen.tsSec(cfg, 0, k))
    ts.sliding(2).zipWithIndex.foreach { case (Seq(t0, t1), i) =>
      val k = i.toLong
      val gap = t1 - t0
      if ((k + 1) % l == 0) // session boundary
        assert(gap > cfg.sessionGapSec, s"inter-session gap $gap too small at k=$k")
      else
        assert(gap < cfg.sessionGapSec && gap >= 0, s"intra-session gap $gap at k=$k")
    }
  }

  test("langId accuracy on the generated corpus stays high") {
    // q30 oracle-checks langId exactly on events-synthesized pages; this
    // covers the realistic generated corpus (mixed fillers, entities,
    // varying lengths) that has no driver-table mirror
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pages = PageGen.genPages(spark, cfg).toDF()
      .withColumn("text", extract_html_text(col("html")))
    val (n, ok) = pages
      .select(count(lit(1)), sum(when(
        operators.TextAnalysis.langId(col("text")) === col("lang"), 1).otherwise(0)))
      .as[(Long, Long)].head()
    assert(n == cfg.nPages)
    assert(ok.toDouble / n >= 0.99, s"langId accuracy ${ok.toDouble / n} < 0.99 on $n pages")
  }

  test("host meta stream aligns with hosts") {
    import spark.implicits._
    val meta = PageGen.hostMeta(spark, cfg).collect()
    assert(meta.nonEmpty)
    assert(meta.map(_.host).distinct.length <= cfg.nHosts)
    assert(meta.forall(m => m.rank >= 0 && m.rank < 100))
  }
}
