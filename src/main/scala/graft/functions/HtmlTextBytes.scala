package graft.functions

/**
 * Byte-level core of the HTML→text extraction: operates directly on UTF-8
 * bytes with a single output allocation — no char decode, no
 * StringBuilder, no intermediate String. This is the 10^12-row hot path:
 * per-page garbage drops from ~5× page size to ~1×, which is what keeps
 * extraction scaling linearly past 8 allocating threads (see
 * BENCH/BASELINE.md notes).
 *
 * Semantics (the engine's fixed extraction spec):
 *   - whitespace = ASCII 0x09–0x0D, 0x20, and U+00A0 (bytes C2 A0);
 *     runs collapse to one 0x20; output trimmed
 *   - script/style/noscript elements, comments, and tags as in
 *     [[HtmlText]]'s scaladoc
 *   - entities: named table + numeric, decoded to UTF-8 bytes (decoded
 *     form is never longer than the entity, so output ≤ input)
 *   - non-ASCII bytes pass through verbatim (malformed UTF-8 is treated
 *     as opaque content, still byte-stable)
 */
object HtmlTextBytes {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  @inline private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b.toInt

  private def regionMatchesLower(in: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > in.length) return false
    var i = 0
    while (i < s.length) {
      if (lower(in(at + i)) != s.charAt(i).toInt) return false
      i += 1
    }
    true
  }

  // reusable per-thread scratch output buffer: extraction output is ≤ input
  // size, so one growable scratch per thread halves allocations on the
  // hot path (only the final right-sized copy is allocated per row)
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def extract(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out = scratch.get()
    if (out.length < n) {
      out = new Array[Byte](Integer.highestOneBit(n) * 2)
      scratch.set(out)
    }
    var o = 0
    var pendingSpace = false
    var emitted = false

    @inline def emitByte(b: Byte): Unit = {
      if (pendingSpace && emitted) { out(o) = ' '; o += 1 }
      pendingSpace = false
      out(o) = b
      o += 1
      emitted = true
    }

    def emitSpace(): Unit = pendingSpace = true

    // skip to after the close tag of a raw-text element
    def skipRawElement(name: String, from: Int): Int = {
      var j = from
      while (j < n) {
        if (in(j) == '<' && j + 1 < n && in(j + 1) == '/' &&
          regionMatchesLower(in, j + 2, name)) {
          var k = j + 2 + name.length
          while (k < n && isWs(in(k))) k += 1
          if (k < n && in(k) == '>') return k + 1
          if (k >= n) return n
        }
        j += 1
      }
      n
    }

    def indexOf(b: Byte, from: Int): Int = {
      var j = from
      while (j < n) { if (in(j) == b) return j; j += 1 }
      -1
    }

    var i = 0
    while (i < n) {
      val c = in(i)
      if (c == '<') {
        if (i + 1 >= n) { i = n }
        else {
          val c1 = in(i + 1)
          if (c1 == '!') {
            if (regionMatchesLower(in, i, "<!--")) {
              // find -->
              var e = -1
              var j = i + 4
              while (e < 0 && j + 2 < n) {
                if (in(j) == '-' && in(j + 1) == '-' && in(j + 2) == '>') e = j
                j += 1
              }
              i = if (e < 0) n else e + 3
              emitSpace()
            } else {
              val e = indexOf('>', i + 1)
              i = if (e < 0) n else e + 1
              emitSpace()
            }
          } else if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z') ||
            c1 == '/' || c1 == '?') {
            val rawName =
              if (regionMatchesLower(in, i, "<script") && isNameEnd(in, i + 7)) "script"
              else if (regionMatchesLower(in, i, "<style") && isNameEnd(in, i + 6)) "style"
              else if (regionMatchesLower(in, i, "<noscript") && isNameEnd(in, i + 9)) "noscript"
              else null
            val e = indexOf('>', i + 1)
            if (e < 0) { i = n }
            else if (rawName != null && in(e - 1) != '/') {
              i = skipRawElement(rawName, e + 1)
            } else {
              i = e + 1
            }
            emitSpace()
          } else {
            emitByte('<'); i += 1
          }
        }
      } else if (c == '&') {
        val dec = decodeEntity(in, i)
        if (dec == null) { emitByte('&'); i += 1 }
        else {
          // decoded bytes go through the same whitespace classifier as
          // literal input: &#9;/&#10;/&#32;/&#160; all collapse to one
          // space exactly like their literal forms (spec rule 6)
          var k = 0
          val bs = dec.bytes
          while (k < bs.length) {
            val b = bs(k)
            if (isWs(b)) { emitSpace(); k += 1 }
            else if (b == 0xC2.toByte && k + 1 < bs.length &&
              bs(k + 1) == 0xA0.toByte) { emitSpace(); k += 2 }
            else { emitByte(b); k += 1 }
          }
          i = dec.next
        }
      } else if (isWs(c)) {
        emitSpace(); i += 1
      } else if (c == 0xC2.toByte && i + 1 < n && in(i + 1) == 0xA0.toByte) {
        emitSpace(); i += 2 // U+00A0 NBSP
      } else {
        emitByte(c); i += 1
      }
    }
    java.util.Arrays.copyOf(out, o)
  }

  /** Mirror of the char reference's `!Character.isLetterOrDigit(charAt)`:
    * `<scripté>` is a tag NAMED "scripté", not a script element, so the
    * byte at the name boundary must be classified like the UTF-16 unit
    * the char-level path sees there — a valid 2-/3-byte UTF-8 sequence
    * decodes to its BMP char; a 4-byte sequence puts a (never
    * letter-or-digit) surrogate at that position; malformed bytes decode
    * to U+FFFD (also not letter-or-digit). Found by fuzzing: the previous
    * ASCII-only test silently swallowed the rest of the document after
    * `<scripté>`. */
  private def isNameEnd(in: Array[Byte], at: Int): Boolean = {
    if (at >= in.length) return true
    val b = in(at)
    if (b >= 0) // ASCII fast path
      !((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9'))
    else {
      val b0 = b & 0xff
      def cnt(k: Int): Int =
        if (at + k < in.length) in(at + k) & 0xff else -1
      def isCont(v: Int): Boolean = v >= 0x80 && v <= 0xbf
      // strict UTF-8 validity (incl. overlong + surrogate-range guards) so
      // malformed input classifies exactly like String's U+FFFD decoding
      val cp =
        if (b0 >= 0xc2 && b0 <= 0xdf && isCont(cnt(1)))
          ((b0 & 0x1f) << 6) | (cnt(1) & 0x3f)
        else if (b0 == 0xe0 && cnt(1) >= 0xa0 && cnt(1) <= 0xbf && isCont(cnt(2)))
          ((b0 & 0x0f) << 12) | ((cnt(1) & 0x3f) << 6) | (cnt(2) & 0x3f)
        else if (((b0 >= 0xe1 && b0 <= 0xec) || b0 == 0xee || b0 == 0xef) &&
            isCont(cnt(1)) && isCont(cnt(2)))
          ((b0 & 0x0f) << 12) | ((cnt(1) & 0x3f) << 6) | (cnt(2) & 0x3f)
        else if (b0 == 0xed && cnt(1) >= 0x80 && cnt(1) <= 0x9f && isCont(cnt(2)))
          ((b0 & 0x0f) << 12) | ((cnt(1) & 0x3f) << 6) | (cnt(2) & 0x3f)
        else -1 // 4-byte (surrogate at this UTF-16 position) or malformed
      !(cp >= 0 && Character.isLetterOrDigit(cp.toChar))
    }
  }

  private final class Decoded(val bytes: Array[Byte], val next: Int)

  private val AMP = Array[Byte]('&')
  private val LT = Array[Byte]('<')
  private val GT = Array[Byte]('>')
  private val QUOT = Array[Byte]('"')
  private val APOS = Array[Byte]('\'')
  private val SP = Array[Byte](' ')

  /** Decode entity at `i` ('&'); null when not a recognized entity. */
  private def decodeEntity(in: Array[Byte], i: Int): Decoded = {
    val n = in.length
    var semi = -1
    var j = i + 1
    val lim = math.min(n, i + 13)
    while (semi < 0 && j < lim) {
      if (in(j) == ';') semi = j
      j += 1
    }
    if (semi < 0) return null
    val len = semi - i - 1
    if (len <= 0) return null

    @inline def is(s: String): Boolean = {
      if (len != s.length) return false
      var k = 0
      while (k < len) {
        if (in(i + 1 + k) != s.charAt(k).toByte) return false
        k += 1
      }
      true
    }

    if (is("amp")) new Decoded(AMP, semi + 1)
    else if (is("lt")) new Decoded(LT, semi + 1)
    else if (is("gt")) new Decoded(GT, semi + 1)
    else if (is("quot")) new Decoded(QUOT, semi + 1)
    else if (is("apos")) new Decoded(APOS, semi + 1)
    else if (is("nbsp")) new Decoded(SP, semi + 1)
    else if (in(i + 1) == '#' && len > 1) {
      var cp = 0L
      var ok = true
      if ((in(i + 2) == 'x' || in(i + 2) == 'X') && len > 2) {
        var k = i + 3
        while (k < semi && ok) {
          val d = Character.digit(in(k).toChar, 16)
          if (d < 0) ok = false else cp = cp * 16 + d
          if (cp > 0x10FFFF) ok = false
          k += 1
        }
        if (len <= 2) ok = false
      } else {
        var k = i + 2
        while (k < semi && ok) {
          val d = in(k) - '0'
          if (d < 0 || d > 9) ok = false else cp = cp * 10 + d
          if (cp > 0x10FFFF) ok = false
          k += 1
        }
      }
      // surrogate code points are invalid scalars (Character.toChars would
      // reject them in the reference implementation) — keep literal
      if (!ok || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) null
      else new Decoded(utf8(cp.toInt), semi + 1)
    } else null
  }

  /** UTF-8 encode a code point (valid range checked by caller). */
  private def utf8(cp: Int): Array[Byte] = {
    if (cp < 0x80) Array(cp.toByte)
    else if (cp < 0x800) Array(
      (0xC0 | (cp >> 6)).toByte, (0x80 | (cp & 0x3F)).toByte)
    else if (cp < 0x10000) Array(
      (0xE0 | (cp >> 12)).toByte, (0x80 | ((cp >> 6) & 0x3F)).toByte,
      (0x80 | (cp & 0x3F)).toByte)
    else Array(
      (0xF0 | (cp >> 18)).toByte, (0x80 | ((cp >> 12) & 0x3F)).toByte,
      (0x80 | ((cp >> 6) & 0x3F)).toByte, (0x80 | (cp & 0x3F)).toByte)
  }
}
