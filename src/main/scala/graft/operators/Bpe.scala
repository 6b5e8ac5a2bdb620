package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * BPE tokenizer TRAINING and application over the corpus — the one
 * model-building step every LLM data pipeline runs before packing
 * (Sennrich et al. 2016; the merge-table form every modern tokenizer
 * uses). Reference analog: StormCV's feature-extraction bolts build a
 * model artifact from the stream and then apply it per tuple
 * (`FeatureExtractionOp` / `FetchAndOperateFetcher`); here the artifact
 * is the ordered merge list and application is a per-row codegen'd
 * projection.
 *
 * Scale shape (the part that matters at 10^12 docs):
 *  - the CORPUS is touched exactly once: [[wordFreqs]] is one
 *    hash-shuffle on the word (map-side partial count first);
 *  - LEARNING runs entirely on the compact distinct-word table
 *    (|vocab| rows ≪ corpus — ~10^7-8 even at 100 TB), one pair-count
 *    aggregation + one 1-row argmax per merge round, with
 *    `localCheckpoint` pinning each round's rendered state exactly like
 *    [[Components.connectedComponents]]'s fixpoint loop (the 1-row
 *    collect per round is the same driver-side step every Pregel-style
 *    loop pays). Production escalation for 32k-merge vocabularies:
 *    incremental pair-count maintenance (fastBPE's delta trick) instead
 *    of per-round recount — same join shape, documented not built;
 *  - ENCODING is a row-local whole-stage-codegen projection
 *    ([[BpeEncode]]): O(len²) worst case per WORD (len ≈ word length,
 *    ~10) and independent of vocabulary size — the merge-rank map rides
 *    the serialized plan like any broadcast model (a 32k-merge table is
 *    ~1 MB). The builtin `replace`-chain twin ([[encodeChain]]) is the
 *    oracle-exact semantic reference (O(merges × doc_len), fine for
 *    test-scale merge lists, the wrong asymptotics at vocab scale).
 *
 * PRECONDITION: tokens must not contain U+0001 (it delimits symbols in
 * the rendered learning state) — true of any text that went through the
 * HTML extraction gate; binary junk belongs to the mojibake gate
 * upstream. The encode-side rank map keys pairs with a SPACE, which is
 * always safe: words are `\s+`-split, so no symbol ever contains one.
 *
 * Determinism: merge picks are totally ordered by (count DESC, a ASC,
 * b ASC) with string order = Spark's UTF8String binary order (UTF-8
 * bytes, i.e. code-point order — NOT Java's UTF-16 `compareTo`, which
 * disagrees on supplementary-plane symbols), so the learned merge list
 * is a pure function of the word-freq table — identical across
 * partitionings, cluster sizes, and reruns (spec-asserted against a
 * reference learner using the same byte order).
 */
object Bpe {

  /** Symbol delimiter of the rendered learning state. */
  val Sep = "\u0001"
  private val Sep2 = Sep + Sep

  /**
   * `(word, freq)` — the one corpus-scale pass. One shuffle on the word
   * (Spark plans the map-side partial count); empty tokens from edge
   * whitespace are dropped so every downstream stage sees real words.
   */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Rendered symbol string: each char wrapped in U+0001 — `",a,,b,"`
    * with `,` standing for U+0001. A merge of adjacent symbols (a, b) is
    * then ONE literal `replace` of `,a,,b,` by `,ab,`: delimiters are
    * per-symbol (never shared between neighbours), so left-to-right
    * non-overlapping replacement — the semantics of both Spark's and
    * DuckDB's `replace` — is exactly BPE's greedy single pass. */
  def render(word: Column): Column =
    // (?s): Java '.' excludes U+2028/U+2029, which are NOT Java \s and
    // so can appear inside a word — every char must be wrapped
    regexp_replace(word, "(?s)(.)", Sep + "$1" + Sep)

  /** One learned merge: `rank` is 0-based application order. */
  final case class Merge(a: String, b: String, count: Long, rank: Int)

  /**
   * Adjacent-symbol pair counts from a rendered freq table — the inner
   * step of every learn round, and (at round 0, over [[render]]ed raw
   * words) the green-gate query surface (q96). Counts every adjacent
   * position (a word `aaa` contributes (a,a) twice), weighted by `freq`.
   * One aggregation on (a, b) — the pair alphabet is small, never
   * corpus-sized.
   */
  def pairCounts(rendered: DataFrame, renderedCol: String,
      freqCol: String): DataFrame = {
    val r = col(renderedCol)
    val syms = split(r.substr(lit(2), length(r) - 2), Sep2)
    val emptyPairs = array().cast("array<struct<a:string,b:string>>")
    rendered
      .withColumn("_syms", syms)
      .select(col(freqCol).cast(LongType).as("_f"),
        explode(when(size(col("_syms")) >= 2,
            transform(sequence(lit(1), size(col("_syms")) - 1),
              i => struct(element_at(col("_syms"), i).as("a"),
                element_at(col("_syms"), i + 1).as("b"))))
          .otherwise(emptyPairs)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("_f")).as("cnt"))
  }

  /** The one-pass merge application on the rendered form (see
    * [[render]] for why a literal replace IS the BPE greedy pass). */
  private def applyMerge(rendered: Column, a: String, b: String): Column =
    call_function("replace", rendered,
      lit(Sep + a + Sep2 + b + Sep), lit(Sep + a + b + Sep))

  /**
   * Learn `numMerges` merges from a `(word, freq)` table. Stops early
   * when no adjacent pair occurs with total weight ≥ 2 (merging a
   * count-1 pair buys nothing). Runs on the compact freq table only —
   * see the object scaladoc for the 100 TB shape. Returns merges in
   * application order.
   */
  def learn(freqs: DataFrame, wordCol: String, freqCol: String,
      numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var cur = freqs
      .select(render(col(wordCol)).as("r"),
        col(freqCol).cast(LongType).as("f"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = pairCounts(cur, "r", "f")
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // 1 row — the fixpoint step of the loop
      if (best.isEmpty || best(0).getLong(2) < 2L) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        out += Merge(a, b, c, rank)
        val prev = cur
        cur = cur.select(applyMerge(col("r"), a, b).as("r"), col("f"))
          .localCheckpoint() // pin: each round O(1) replays, like CC
        prev.unpersist()
        rank += 1
      }
    }
    cur.unpersist()
    out.result()
  }

  /**
   * Builtin `replace`-chain encoder — the ORACLE-EXACT twin of
   * [[encode]] (q97's DuckDB SQL is this chain verbatim): normalize
   * whitespace, wrap every non-space char in U+0001, apply each merge in
   * rank order as one literal replace, strip delimiters back to
   * space-joined tokens. Fully codegen'd builtins, but O(merges) passes
   * over each doc — the reference path, not the vocab-scale one.
   */
  def encodeChain(text: Column, merges: Seq[Merge]): Column = {
    val norm = trim(regexp_replace(coalesce(text, lit("")), "\\s+", " "))
    val rendered = regexp_replace(norm, "(\\S)", Sep + "$1" + Sep)
    val merged = merges.foldLeft(rendered)((s, m) => applyMerge(s, m.a, m.b))
    // within a word symbols are separated by SepSep → ' '; across words
    // the single space already separates; then strip the per-symbol Sep.
    call_function("replace",
      call_function("replace", merged, lit(Sep2), lit(" ")),
      lit(Sep), lit(""))
  }

  /** The merge list as a persistable model table `(rank, a, b, count)` —
    * the artifact a training pipeline writes once after [[learn]] and
    * every encode job loads. */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.a, m.b, m.count)).toDF("rank", "a", "b", "count")
  }

  /** Load a persisted merge table back into application order. The
    * artifact is model-sized (≤ vocab rows), so the collect here is the
    * same tiny model-load every encode job pays once.
    *
    * PRECONDITION: the table must be a [[learn]] output — ranks dense
    * from 0 in DEPENDENCY order (a composite symbol's merge ranked
    * after the merges that build its parts) with no duplicate pairs.
    * [[encode]] ≡ [[encodeChain]] holds for exactly that class of merge
    * lists (see [[BpeEncode]]); a hand-edited table violating it gets
    * greedy-lowest-rank semantics from the expression and in-order
    * semantics from the chain, which can differ. */
  def mergesFrom(df: DataFrame): Seq[Merge] =
    df.select(col("rank").cast(IntegerType), col("a"), col("b"),
        col("count").cast(LongType))
      .orderBy(col("rank").asc).collect().toSeq
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3), r.getInt(0)))

  /** Vocab-scale encoder: tokens of `text` under `merges`, space-joined
    * (tokens never contain spaces), via the codegen'd [[BpeEncode]]
    * expression — value-identical to [[encodeChain]] (spec-asserted,
    * fuzzed). */
  def encode(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      BpeEncode(org.apache.spark.sql.graftshim.Bridge.expression(text),
        merges.map(m => (m.a, m.b))))
}

/**
 * `bpe_encode(text, merges): string` — greedy BPE application as one
 * whole-stage-codegen scalar. Per word: repeatedly find the present
 * adjacent pair with the lowest merge rank and merge all its occurrences
 * left to right, until no learnable pair remains. For merge lists in
 * LEARNED dependency order (every [[Bpe.learn]] output — the required
 * form, see [[Bpe.mergesFrom]]) this is equivalent to applying the
 * merges in rank order one pass each: a later merge can never create an
 * instance of an earlier-ranked pair, because both elements of the
 * earlier pair predate it and merging never makes two pre-existing
 * symbols newly adjacent. That is exactly what [[Bpe.encodeChain]]
 * does, so the two are value-identical by construction and the spec
 * fuzzes it.
 *
 * The rank map is built once per expression instance and rides the
 * serialized plan (a model artifact, ~1 MB at 32k merges).
 */
case class BpeEncode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got $other")
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.buildRanks(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: Janino's generics support is partial, and the generated
    // cast must stay compilable (BpeSpec pins this with fallback=false)
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.operators.BpeEncode.compute($c, $ranksRef)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  import org.apache.spark.unsafe.types.UTF8String

  private val splitter = java.util.regex.Pattern.compile("\\s+")

  /** Pair key → 0-based rank; key joins the two symbols with a space
    * (safe: symbols come from `\s+`-split words, so never contain one). */
  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var r = 0
    merges.foreach { case (a, b) =>
      // duplicate pair (malformed table): keep the LOWEST rank — in the
      // chain the first occurrence merges everything, the repeat no-ops
      m.putIfAbsent(a + " " + b, Integer.valueOf(r)); r += 1
    }
    m
  }

  /** Static so generated code and interpreted eval share one body. */
  def compute(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): UTF8String = {
    // \s+ split + empty-token skip ≡ the chain twin's
    // trim(regexp_replace(text, "\s+", " ")) normalization for EVERY
    // input (edge/odd whitespace included — fuzz-asserted).
    val words = splitter.split(text.toString, -1)
    val sb = new java.lang.StringBuilder()
    var first = true
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (!word.isEmpty) {
        // code-point symbols (surrogate-pair safe)
        var n = Character.codePointCount(word, 0, word.length)
        val syms = new Array[String](n)
        var ci = 0; var si = 0
        while (ci < word.length) {
          val cp = word.codePointAt(ci)
          val cc = Character.charCount(cp)
          syms(si) = word.substring(ci, ci + cc)
          ci += cc; si += 1
        }
        var merging = n >= 2
        while (merging) {
          var bestRank = Integer.MAX_VALUE
          var bestA: String = null; var bestB: String = null
          var i = 0
          while (i < n - 1) {
            val r = ranks.get(syms(i) + " " + syms(i + 1))
            if (r != null && r.intValue < bestRank) {
              bestRank = r.intValue; bestA = syms(i); bestB = syms(i + 1)
            }
            i += 1
          }
          if (bestA == null) merging = false
          else {
            // merge all occurrences of (bestA, bestB), left to right
            var read = 0; var write = 0
            while (read < n) {
              if (read < n - 1 && syms(read) == bestA && syms(read + 1) == bestB) {
                syms(write) = bestA + bestB; read += 2
              } else { syms(write) = syms(read); read += 1 }
              write += 1
            }
            n = write
            merging = n >= 2
          }
        }
        var i = 0
        while (i < n) {
          if (!first) sb.append(' ')
          sb.append(syms(i)); first = false; i += 1
        }
      }
      w += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
