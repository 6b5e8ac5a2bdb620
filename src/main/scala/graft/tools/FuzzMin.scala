package graft.tools
import graft.functions.HtmlText
object FuzzMin {
  def gen(caseI: Int): String = FuzzX.gen(caseI)
  def diff(s: String): Boolean = HtmlText.extractString(s) != HtmlText.extractStringReference(s)
  def esc(s: String): String = s.flatMap {
    case c if c >= ' ' && c < 127 => c.toString
    case c => f"\\u${c.toInt}%04x"
  }
  def minimize(s0: String): String = {
    var s = s0
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < s.length && !changed) {
        var len = math.max(1, s.length / 4)
        while (len >= 1 && !changed) {
          val cand = s.substring(0, i) + s.substring(math.min(s.length, i + len))
          if (cand.length < s.length && diff(cand)) { s = cand; changed = true }
          len /= 2
        }
        i += 1
      }
    }
    s
  }
  def main(args: Array[String]): Unit = {
    var found = 0
    var caseI = 0
    while (caseI < 100000 && found < 8) {
      val s = gen(caseI)
      if (diff(s)) {
        found += 1
        val m = minimize(s)
        println("MIN [" + esc(m) + "] fast=[" + esc(HtmlText.extractString(m)) +
          "] ref=[" + esc(HtmlText.extractStringReference(m)) + "]")
      }
      caseI += 1
    }
    println("scan done, found=" + found)
  }
}
