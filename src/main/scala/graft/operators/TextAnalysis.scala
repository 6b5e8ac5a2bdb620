package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-analysis operators for the training-data pipeline: token counting,
 * quality scoring, language identification, and document fingerprinting.
 *
 * The reference's per-frame feature extractors
 * (`operation/FeatureExtractionOp.java:34-132`,
 * `operation/ColorHistogramOp.java:30-121`) become per-page text features
 * here (SURVEY.md §2.2). Everything is expressed with codegen'd built-in
 * expressions (`regexp_count`, `length`, `md5`) or custom Catalyst
 * expressions — no Scala UDFs in the hot path — and all scores are
 * integers so results are engine- and order-independent.
 */
object TextAnalysis {

  /** Whitespace-token count (`\S+` runs). */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** Non-whitespace character count. */
  def charCount(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** GPT-2-style pre-tokenizer pattern, minus the trailing-space negative
    * lookahead (RE2 has no lookahead, and the oracle runs on RE2; the
    * lookahead only changes how trailing spaces group, not counts of the
    * text tokens this counts): contractions, space-prefixed letter runs,
    * digit runs, punctuation runs. Java regex and RE2 agree on \p{L}/\p{N}
    * classes and leftmost-first alternation, so the count is
    * engine-portable. */
  val bpePattern = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish subword-boundary token count — the tokenizer-budget estimate
    * a training pipeline bins documents by (whitespace tokens undercount
    * punctuation-heavy text badly). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpePattern))

  /**
   * Integer quality score 0..100 from length/punctuation/stopword signals
   * (analog of a CC quality filter; all-integer for determinism):
   *   +40 if ≥ 32 tokens, +20 if ≥ 200 non-ws chars,
   *   +20 if mean token length in [3,9] (×10 fixed-point),
   *   +20 if ≥ 2 English stopword hits.
   */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    val chars = charCount(text)
    val meanLenX10 = when(toks > 0, (chars * 10).cast(LongType) / toks.cast(LongType)).otherwise(0.0)
    val stop = regexp_count(text, lit("\\b(the|a|and|of|is|to|in)\\b"))
    (when(toks >= 32, 40).otherwise(0) +
      when(chars >= 200, 20).otherwise(0) +
      when(floor(meanLenX10) >= 30 && floor(meanLenX10) <= 90, 20).otherwise(0) +
      when(stop >= 2, 20).otherwise(0)).cast(IntegerType)
  }

  /** Language markers used by [[langId]] — mirrored in the DuckDB oracle. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|was|this|that|with)\\b",
    "de" -> "\\b(und|der|die|nicht|werden|eine?)\\b",
    "fr" -> "\\b(vous|dans|pour|faire|avec|les?)\\b",
    "es" -> "\\b(como|haber|tener|para|el|una?)\\b")

  val cjkPattern = "[\\x{4e00}-\\x{9fff}]"

  /**
   * N-gram/stopword language heuristic: argmax of marker-hit counts with a
   * CJK-codepoint fast path; ties resolved by the fixed marker order; no
   * hits ⇒ "und" (undetermined). Deterministic; SQL-expressible for the
   * oracle.
   */
  def langId(text: Column): Column = {
    val cjk = regexp_count(text, lit(cjkPattern))
    val scores = langMarkers.map { case (l, pat) => l -> regexp_count(text, lit(pat)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first matching language wins on equal scores: en > de > fr > es
    val ordered = scores.foldLeft(lit(null).cast(StringType): Column) { case (acc, (l, s)) =>
      coalesce(acc, when(s === best && best > 0, lit(l)))
    }
    when(cjk >= 3, lit("zh")).otherwise(coalesce(ordered, lit("und")))
  }

  /** Normalization + md5 fingerprint (near-layout-invariant doc identity). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", "").cast(BinaryType))

  /** 64-bit SimHash over whitespace tokens (custom codegen'd expression). */
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  /** Min rolling-hash (Rabin-Karp, window 8 chars) fingerprint. */
  def minRollingHash(text: Column): Column =
    Bridge.column(MinRollingHash(Bridge.expression(text)))

  /** Hamming distance between two simhash longs. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}

/**
 * Engine-portable 64-bit hashing: md5 truncations, chosen (like the
 * MinHash signatures in [[MinHashBandSigs]]) because md5 is the one hash
 * both this engine and the DuckDB oracle share — a 64-bit mix hash would
 * need wrapping multiplies that SQL cannot express, leaving SimHash
 * forever rows-only-checked. md5 costs ~3× an FNV mix per token, a price
 * paid only inside the sketch operators (never the page hot path), and
 * buys end-to-end value verification of the near-dup family.
 */
object Md5Hash {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The thread's reset MD5 digest — shared by every md5-based operator
    * (one instance per executor thread, not one per call site). */
  def local(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  /** First 8 digest bytes big-endian — the long whose hex form is the
    * first 16 chars of the md5 hex string (what SQL parses digit-wise). */
  def hash64(s: String): Long =
    hash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0, -1)

  /** [[hash64]] over a UTF-8 byte range (len < 0 ⇒ to end) — the
    * allocation-free form the tokenizer hot path uses. */
  def hash64(utf8: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(utf8, off, if (len < 0) utf8.length - off else len)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Uniform weight in [-1000, 1000] from the top 48 hash bits (48 so the
    * oracle's digit-expansion arithmetic stays inside exact BIGINTs). */
  def weight48(s: String): Long = ((hash64(s) >>> 16) % 2001L) - 1000L
}

/**
 * 64-bit SimHash: per whitespace-token md5-derived 64-bit hash
 * ([[Md5Hash.hash64]]); bit b of the result = sign of Σ_token-occurrences
 * (±1 by token-hash bit b). The standard near-dup sketch (Charikar);
 * hamming distance ≤ k ⇒ near-duplicate. Every ingredient (md5, bit
 * votes, sign) is SQL-expressible, so the DuckDB oracle reproduces
 * signatures exactly (q22).
 */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash64 requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** FNV-1a 64 over chars, finished with splitmix64 — kept for
    * [[MinRollingHash]]'s short-string path (rolling hashes are
    * inherently engine-native; SimHash itself uses [[Md5Hash]]). */
  def tokenHash(s: String, from: Int, to: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < to) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    graft.sources.PageGen.mix64(h)
  }

  /** Java-regex `\s` (ASCII): the same class `tokenCount`'s `\S+` uses,
    * so the zero-token prefilter and the tokenizer agree exactly.
    * (Character.isWhitespace would also take U+001C–1F and Unicode
    * spaces — a silent third whitespace definition.) RE2 (the oracle)
    * additionally excludes \x0B from `\s`; that residual divergence is
    * shared with every regexp-tokenizing green query and is absent from
    * the test corpora.
    *
    * Byte-level on purpose: every byte of a multibyte UTF-8 sequence is
    * >= 0x80, so ASCII-whitespace segmentation over the raw UTF-8 bytes
    * is exactly the char-level segmentation - and the token's byte range
    * feeds md5 directly, with no per-token String/array allocation. */
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D) // space \t \n \x0B \f \r

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = Md5Hash.hash64(bytes, start, i - start)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * Minimum Rabin-Karp rolling hash over all 8-char windows — a cheap
 * content-defined fingerprint robust to global shifts (winnowing-style,
 * w = whole doc). Empty/short text hashes the whole string.
 */
case class MinRollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"min_rolling_hash requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    MinRollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MinRollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinRollingHash =
    copy(child = newChild)
}

object MinRollingHash {
  final val W = 8
  final val B = 0x100000001B3L // base

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0L
    if (n <= W) return SimHash64.tokenHash(s, 0, n)
    // B^(W-1) for the rolling subtract
    var bw = 1L
    var k = 0
    while (k < W - 1) { bw *= B; k += 1 }
    var h = 0L
    var i = 0
    while (i < W) { h = h * B + s.charAt(i).toLong; i += 1 }
    var min = graft.sources.PageGen.mix64(h)
    while (i < n) {
      h = (h - s.charAt(i - W).toLong * bw) * B + s.charAt(i).toLong
      val m = graft.sources.PageGen.mix64(h)
      if (java.lang.Long.compareUnsigned(m, min) < 0) min = m
      i += 1
    }
    min
  }
}
