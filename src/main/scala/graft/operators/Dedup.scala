package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for web-scale corpora — the training-data-
 * pipeline layer on top of the page engine.
 *
 * Scale notes (the part that matters at 10^12 rows):
 *  - exact dedup is one hash-shuffle on a 16-byte digest (never on the
 *    full text — map-side the text reduces to md5 before the exchange);
 *  - MinHash-LSH shuffles only (band, signature) pairs — `bands` rows per
 *    doc — then equi-joins buckets; candidate verification re-joins the
 *    shingle sets only for candidate pairs (a tiny fraction);
 *  - SimHash reduces each doc to one long; near-dup check is a self-join
 *    on bucket prefixes + popcount filter;
 *  - pair outputs are always keyed `id_a < id_b` so results are set-stable.
 *
 * All similarity scores are quantized to integers (see [[VectorOps]]) so
 * outputs are bit-identical across engines and cluster sizes.
 */
object Dedup {

  /**
   * Exact duplicate groups by content digest.
   * Returns (text_hash, keeper = min id, dup_cnt).
   */
  def exactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol).cast(BinaryType)).as("text_hash"), col(idCol))
      .groupBy($"text_hash".asInstanceOf[Column])
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("dup_cnt"))

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Word n-gram shingle set, one row per distinct (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    // sequence(0, -1) would step backwards — guard short docs to an empty set
    val idxs = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("toks"), idxs.as("idxs"))
      .select(col(idCol), explode($"idxs").as("i"), $"toks")
      .select(col(idCol), concat_ws(" ",
        (0 until n).map(k => element_at($"toks", $"i" + k + 1)): _*).as("shingle"))
      .distinct()
  }

  /**
   * N-gram Jaccard near-duplicate pairs with quantized similarity
   * `jacc_q = floor(1000 * |A∩B| / |A∪B|) ≥ minJaccQ`.
   *
   * Plan shape: shingle-explode → self-equi-join on shingle (hash shuffle
   * on the shingle, NOT on the pair) → count intersections per pair →
   * join per-doc set sizes. The equi-join on shingle keys is what keeps
   * this from being a cross join at scale; very frequent shingles should
   * be capped upstream (stopword shingles explode pair counts).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccQ: Int = 500): DataFrame = {
    // no .cache() here: a library operator must not pin executor memory
    // behind the caller's back; the shuffle files of the shingle exchange
    // are reused by Spark for the two consumers (sizes + inter)
    val sh = shingles(df, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), $"shingle")
    val b = sh.select(col(idCol).as("id_b"), $"shingle")
    val inter = a.join(b, Seq("shingle"))
      .where($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), $"sz".as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), $"sz".as("sz_b")), "id_b")
      .select($"id_a", $"id_b",
        floor(lit(1000) * $"inter" / ($"sz_a" + $"sz_b" - $"inter")).cast(LongType).as("jacc_q"))
      .where($"jacc_q" >= minJaccQ)
  }

  /**
   * MinHash signature rows: `bands` independent min-hashes per doc, each
   * the lexicographic min of `md5(shingle || '|' || band)` over the
   * doc's shingle set (string-min is engine-portable; a band's equal
   * signature ⇒ candidate bucket). One (id, band, sig) row per band.
   */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val bandCols = explode(sequence(lit(0), lit(bands - 1))).as("band")
    sh.select(col(idCol), $"shingle", bandCols)
      .groupBy(col(idCol), $"band")
      .agg(min(md5(concat($"shingle", lit("|"), $"band".cast(StringType))
        .cast(BinaryType))).as("sig"))
  }

  /**
   * MinHash-LSH candidate pairs: docs sharing ≥1 (band, sig) bucket,
   * verified with the exact quantized Jaccard. The classic
   * shingle→minhash→band→bucket-join pipeline; only bucket-mates are ever
   * compared, so cost is driven by bucket collision rate, not |docs|².
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8, minJaccQ: Int = 500): DataFrame = {
    val mh = minhashBands(df, idCol, textCol, n, bands)
    val l = mh.select($"band", $"sig", col(idCol).as("id_a"))
    val r = mh.select($"band", $"sig", col(idCol).as("id_b"))
    val cands = l.join(r, Seq("band", "sig"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
    val verified = ngramJaccardPairs(
      df.join(cands.select(explode(array($"id_a", $"id_b")).as(idCol)).distinct(), idCol),
      idCol, textCol, n, minJaccQ)
    cands.join(verified, Seq("id_a", "id_b"))
  }

  /**
   * SimHash near-duplicate pairs: hamming(simhash_a, simhash_b) ≤ maxDist.
   * Bucket by the low 16 bits to avoid the full cross join (near-dups
   * usually share low bits; for guaranteed recall use 4 rotated prefixes).
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol), TextAnalysis.simhash64(col(textCol)).as("sig"))
    // 4-block decomposition (Manku et al.): any pair within hamming k=3
    // agrees exactly on ≥1 of 4 16-bit blocks — bucket join per block.
    val blocks = withSig.select(col(idCol), $"sig",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"), shiftrightunsigned($"sig", b * 16)
          .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col(idCol), $"sig", $"bk.blk".as("blk"), $"bk.key".as("key"))
    val l = blocks.select($"blk", $"key", col(idCol).as("id_a"), $"sig".as("sig_a"))
    val r = blocks.select($"blk", $"key", col(idCol).as("id_b"), $"sig".as("sig_b"))
    l.join(r, Seq("blk", "key"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        TextAnalysis.hamming64($"sig_a", $"sig_b").as("dist"))
      .distinct()
      .where($"dist" <= maxDist)
  }

  /**
   * Embedding-cosine near-duplicate pairs: quantized cosine ≥ minCosQ/1e6.
   * LSH-bucket prefilter (sign random projections) keeps the join keyed;
   * exact quantized verification inside buckets.
   */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosQ: Long = 950000L, nPlanes: Int = 12): DataFrame = {
    val withB = df.select(col(idCol), col(vecCol),
      VectorOps.lsh_bucket(col(vecCol), nPlanes).as("bucket"),
      VectorOps.norm_q(col(vecCol)).as("nq"))
    val l = withB.select($"bucket", col(idCol).as("id_a"), col(vecCol).as("v_a"), $"nq".as("nq_a"))
    val r = withB.select($"bucket", col(idCol).as("id_b"), col(vecCol).as("v_b"), $"nq".as("nq_b"))
    l.join(r, Seq("bucket"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        floor(VectorOps.cosineScore(VectorOps.dot_q($"v_a", $"v_b"), $"nq_a", $"nq_b") * 1e6)
          .cast(LongType).as("cos_q"))
      .where($"cos_q" >= minCosQ)
  }
}
