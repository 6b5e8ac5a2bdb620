package graft.tools
import graft.functions.HtmlText
object FuzzX {
  // shared with FuzzMin: the minimizer regenerates these exact cases by
  // caseI, so pool drift between the two files would defeat it
  val frags = Array("<p>", "</p>", "word", "&amp;", " ", "&#65;", "x", "\u00e9",
      "<b>x</b>", "<!--c-->", "<script>s</script>", "<", ">", "&", "\n", "\t",
      "&nbsp;", "&#x1F600;", "&#xD800;", "&bogus;", "&#;", "<style>p{}</style>",
      "<NOSCRIPT>n</noscript>", "<div class=x>", "\u2014", "&#8212;", "  ",
      "&#9;", "&#10;", "&#160;", "&#xA0;", "&#8232;", "\u00a0",
      "<![CDATA[", "]]>", "</", "<>", "=\"", "&#x", "&am", "&#1114112;", "&#x110000;",
      "\r", "\u000b", "\f", "<script><script>", "</script >", "</SCRIPT>",
      "<a href=\"x>y\">", "<br/>", "&AMP;", "&#X41;", "&#0;", "&#x0;", "<!---->",
      "<!--", "-->", "<!", "<?php ?>", "<?", "?>", "<style", "<script",
      "&quot", ";", "&;", "&#xfffd;", "\ufffd", "\u3000", "a=b", "'",
      "<p/>", "< p>", "<\tp>", "<p\n>", "&lt;script&gt;", "&#60;", "&#38;#38;")

  def gen(caseI: Int): String = {
    val len = (graft.sources.PageGen.rnd(311L, 0, caseI) >>> 1).toInt % 60
    (0 until len).map { i =>
      frags(((graft.sources.PageGen.rnd(311L, 1, caseI, i) >>> 1) % frags.length).toInt)
    }.mkString
  }

  def main(args: Array[String]): Unit = {
    var worst = 0
    var caseI = 0
    while (caseI < (if (args.nonEmpty) args(0).toInt else 100000)) {
      val s = gen(caseI)
      val fast = HtmlText.extractString(s)
      val ref = HtmlText.extractStringReference(s)
      if (fast != ref) {
        println("DIVERGENCE on: " + s.take(200).replace("\n","\\n").replace("\t","\\t") +
          "\n fast=" + fast + "\n ref =" + ref)
        worst += 1
        if (worst > 5) sys.exit(1)
      }
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (!java.util.Objects.equals(HtmlText.extract(b), HtmlText.extract(b.clone()))) {
        println("INSTABILITY on: " + s.take(200)); sys.exit(1)
      }
      caseI += 1
    }
    println("fuzz done: " + (if (args.nonEmpty) args(0) else "100000") + " cases, " + worst + " divergences")
    if (worst > 0) sys.exit(1) // any divergence is a failure for automation
  }
}
