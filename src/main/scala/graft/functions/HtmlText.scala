package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic HTML → text extraction.
 *
 * This is the engine's analog of the reference's per-frame scalar stage
 * (StormCV `operation/GrayscaleOp.java:32-38`, `operation/ScaleImageOp.java:24-92`
 * — the pure per-row decode/transform applied to every `Frame`). Where the
 * reference decodes `Frame.imageBytes` (`model/Frame.java:40`), we decode
 * `html: binary` into `text: string` with a **byte-stable** pure function:
 * same input bytes ⇒ same output string, on every JVM, locale, and Spark
 * partitioning (the north rule's per-row invariant).
 *
 * Extraction spec (fixed, versioned by test golden hashes):
 *   1. Input is UTF-8 bytes, processed byte-level ([[HtmlTextBytes]]);
 *      non-ASCII bytes pass through verbatim (malformed UTF-8 is opaque
 *      content — still byte-stable). Whitespace = ASCII 0x09–0x0D, 0x20,
 *      and U+00A0.
 *   2. `<script>`, `<style>`, `<noscript>` elements are dropped entirely
 *      (case-insensitive; content skipped until the matching close tag, or
 *      end-of-input if unclosed).
 *   3. Comments `<!-- ... -->` are dropped (unclosed comment ⇒ rest dropped).
 *   4. Any other tag `<...>` is replaced by a single space (unclosed tag at
 *      EOF consumes the rest). A `<` not followed by `[a-zA-Z!/?]` is literal.
 *   5. Entities: the fixed table &amp; &lt; &gt; &quot; &apos; &nbsp; plus
 *      numeric `&#NNN;` / `&#xHH;` (code points ≤ 0x10FFFF). Anything else
 *      is kept literally.
 *   6. All whitespace runs (including NBSP from &nbsp;) collapse to one
 *      ASCII space; leading/trailing whitespace trimmed.
 */
object HtmlText {

  /** Entry point used by both interpreted eval and generated code —
    * byte-level fast path ([[HtmlTextBytes]]): zero intermediate decode. */
  def extractUTF8(bytes: Array[Byte]): UTF8String =
    UTF8String.fromBytes(HtmlTextBytes.extract(bytes))

  def extract(bytes: Array[Byte]): String =
    new String(HtmlTextBytes.extract(bytes), StandardCharsets.UTF_8)

  def extractString(html: String): String =
    new String(HtmlTextBytes.extract(html.getBytes(StandardCharsets.UTF_8)),
      StandardCharsets.UTF_8)

  /** Character-level reference implementation, kept as the cross-check
    * oracle for the byte-level fast path (tests assert equality). */
  def extractStringReference(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false // collapse whitespace runs
    var emitted = false      // suppress leading whitespace

    // spec whitespace class (rule 1): 0x09..0x0D, 0x20, U+00A0 -- NOT
    // Character.isWhitespace, which also accepts 0x1C..0x1F/U+2028 and
    // would diverge from the byte-level path
    def isSpecWs(c: Char): Boolean =
      c == ' ' || (c >= '\u0009' && c <= '\u000D') || c == '\u00A0'

    def emit(c: Char): Unit = {
      if (isSpecWs(c)) {
        pendingSpace = true
      } else {
        if (pendingSpace && emitted) out.append(' ')
        pendingSpace = false
        out.append(c)
        emitted = true
      }
    }

    // case-insensitive region match at i
    def matchesIgnoreCase(s: String, at: Int): Boolean =
      html.regionMatches(true, at, s, 0, s.length)

    // find case-insensitive closing tag like </script ; returns index after
    // its '>', or n if absent
    def skipRawElement(name: String, from: Int): Int = {
      var j = from
      val close = "</" + name
      while (j < n) {
        if (html.charAt(j) == '<' && matchesIgnoreCase(close, j)) {
          val after = j + close.length
          // allow whitespace then '>' (byte-path parity: 0x09..0x0D, 0x20)
          var k = after
          while (k < n && (html.charAt(k) == ' ' ||
            (html.charAt(k) >= '\u0009' && html.charAt(k) <= '\u000D'))) k += 1
          if (k < n && html.charAt(k) == '>') return k + 1
          if (k >= n) return n
        }
        j += 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 1 >= n) { i = n } // trailing '<' at EOF: dropped with tag rule
        else {
          val c1 = html.charAt(i + 1)
          if (c1 == '!' ) {
            if (matchesIgnoreCase("<!--", i)) {
              val end = html.indexOf("-->", i + 4)
              i = if (end < 0) n else end + 3
              pendingSpace = true
            } else { // <!DOCTYPE ...> and friends
              val end = html.indexOf('>', i + 1)
              i = if (end < 0) n else end + 1
              pendingSpace = true
            }
          } else if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z') || c1 == '/' || c1 == '?') {
            // tag name for raw-text elements
            val rawName =
              if (matchesIgnoreCase("<script", i) && isNameEnd(html, i + 7)) "script"
              else if (matchesIgnoreCase("<style", i) && isNameEnd(html, i + 6)) "style"
              else if (matchesIgnoreCase("<noscript", i) && isNameEnd(html, i + 9)) "noscript"
              else null
            val end = html.indexOf('>', i + 1)
            if (end < 0) { i = n }
            else if (rawName != null && html.charAt(end - 1) != '/') {
              i = skipRawElement(rawName, end + 1)
            } else {
              i = end + 1
            }
            pendingSpace = true
          } else {
            emit('<'); i += 1
          }
        }
      } else if (c == '&') {
        val (repl, next) = decodeEntity(html, i)
        if (repl == null) { emit('&'); i += 1 }
        else {
          var k = 0
          while (k < repl.length) { emit(repl.charAt(k)); k += 1 }
          i = next
        }
      } else {
        emit(c); i += 1
      }
    }
    out.toString
  }

  private def isNameEnd(s: String, at: Int): Boolean =
    at >= s.length || !Character.isLetterOrDigit(s.charAt(at))

  /** Decode entity starting at `i` ('&'); null if not a recognized entity. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) return (null, i)
    val body = s.substring(i + 1, semi)
    val repl = body match {
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ =>
        if (body.length > 1 && body.charAt(0) == '#') {
          val (digits, radix) =
            if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
              (body.substring(2), 16)
            else (body.substring(1), 10)
          try {
            val cp = Integer.parseInt(digits, radix)
            // surrogate range is not a valid scalar: keep literal
            if (cp >= 0 && cp <= 0x10FFFF && digits.nonEmpty &&
              !(cp >= 0xD800 && cp <= 0xDFFF))
              new String(Character.toChars(cp))
            else null
          } catch { case _: IllegalArgumentException => null }
        } else null
    }
    if (repl == null) (null, i) else (repl, semi + 1)
  }
}

/**
 * Catalyst expression form of [[HtmlText.extract]]: a first-class,
 * codegen-participating column operator, so extraction composes with
 * column pruning / predicate movement like any built-in (SURVEY.md §4:
 * the reference's `retainImage(false)` blob-drop is Catalyst
 * `ColumnPruning` here — `html` is never carried past this expression).
 */
case class ExtractHtmlText(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_html_text requires binary input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.extractUTF8(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extractUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractHtmlText =
    copy(child = newChild)
}

object ExtractHtmlText {
  /** Column API: `df.withColumn("text", extract_html_text($"html"))` */
  def extract_html_text(c: Column): Column =
    Bridge.column(ExtractHtmlText(Bridge.expression(c)))
}
