package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BloomSet

/** Bloom seen-set (crawl-frontier admission sketch) — round-5 addition. */
class BloomSetSpec extends SparkSpec {

  private val M = 1024L
  private val K = 4

  private def keyed(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => s"https://host${i % 7}.example/p/$i").toDF("key")
  }

  private def asMap(bloom: DataFrame): Map[(Long, Long), Long] = {
    import spark.implicits._
    bloom.as[(Long, Long, Long)].collect()
      .map { case (s, w, b) => (s, w) -> b }.toMap
  }

  test("bloom: no false negatives, ever — every inserted key flags") {
    val ins = keyed(0 until 2000)
    val bloom = BloomSet.bloomOf(ins, "key", M, K)
    val flagged = BloomSet.probe(ins, "key", bloom, M, K)
      .where(col("maybe_seen")).count()
    assert(flagged == 2000L)
  }

  test("bloom: false-positive rate in the theory band; gate removes them") {
    // load kn/m = 4*2000/1024 ≈ 7.8 — deliberately overloaded so the FP
    // rate is large and measurable: (1 - e^-7.8)^4 ≈ 0.9984... use a
    // saner load: 500 keys → kn/m ≈ 1.95, fp ≈ (1-e^-1.95)^4 ≈ 0.51
    val ins = keyed(0 until 500)
    val fresh = keyed(10000 until 11000)
    val bloom = BloomSet.bloomOf(ins, "key", M, K)
    val fp = BloomSet.probe(fresh, "key", bloom, M, K)
      .where(col("maybe_seen")).count()
    // expected ≈ 510; determinism is exact, the band only guards theory
    assert(fp > 300 && fp < 750, s"fp=$fp")
    val gated = BloomSet.gate(fresh, "key", bloom, M, K).count()
    assert(gated == 1000L - fp)
    // and the gate never lets an inserted key through
    assert(BloomSet.gate(ins, "key", bloom, M, K).count() == 0L)
  }

  test("bloom: increment ≡ batch, and replays are absorbed (idempotent)") {
    val a = keyed(0 until 300)
    val b = keyed(300 until 600)
    val whole = BloomSet.bloomOf(keyed(0 until 600), "key", M, K, shards = 2)
    val inc = BloomSet.bloomIncrement(
      BloomSet.bloomOf(a, "key", M, K, shards = 2), b, "key", M, K, shards = 2)
    assert(asMap(inc) == asMap(whole))
    // re-deliver chunk b in full: bit_or absorbs it, table unchanged
    val replay = BloomSet.bloomIncrement(inc, b, "key", M, K, shards = 2)
    assert(asMap(replay) == asMap(whole))
  }

  test("bloom: table invariant under input partitioning and duplicates") {
    val ins = keyed(0 until 400)
    val base = asMap(BloomSet.bloomOf(ins, "key", M, K, shards = 2))
    val scrambled = asMap(BloomSet.bloomOf(
      ins.union(ins).orderBy(rand(11)).repartition(13), "key", M, K, shards = 2))
    assert(base == scrambled)
  }

  test("bloom: sharding preserves no-false-negatives and routes by key") {
    val ins = keyed(0 until 800)
    val bloom = BloomSet.bloomOf(ins, "key", M, K, shards = 4)
    assert(bloom.select(col("shard")).distinct().count() == 4L)
    val flagged = BloomSet.probe(ins, "key", bloom, M, K, shards = 4)
      .where(col("maybe_seen")).count()
    assert(flagged == 800L)
    // word_idx stays inside one shard's bit-space
    val bad = bloom.where(col("word_idx") < 0 ||
      col("word_idx") >= M / BloomSet.WordBits).count()
    assert(bad == 0L)
  }

  test("bloom: shuffle-join probe (broadcastBloom=false) agrees exactly") {
    val ins = keyed(0 until 500)
    val fresh = keyed(5000 until 5500)
    val bloom = BloomSet.bloomOf(ins, "key", M, K, shards = 2)
    val bc = BloomSet.probe(fresh, "key", bloom, M, K, shards = 2)
      .where(col("maybe_seen")).select("key").collect().map(_.getString(0)).sorted
    val sj = BloomSet.probe(fresh, "key", bloom, M, K, shards = 2,
        broadcastBloom = false)
      .where(col("maybe_seen")).select("key").collect().map(_.getString(0)).sorted
    assert(bc.sameElements(sj))
  }

  test("bloom: parameter validation is loud") {
    val df = keyed(0 until 10)
    intercept[IllegalArgumentException] {
      BloomSet.bloomOf(df, "key", mBits = 1000, kHashes = 4) // not a power of 2
    }
    intercept[IllegalArgumentException] {
      BloomSet.bloomOf(df, "key", mBits = 1024, kHashes = 0)
    }
    intercept[IllegalArgumentException] {
      BloomSet.bloomOf(df, "key", mBits = 1024, kHashes = 4, shards = 0)
    }
  }

  test("bloom: null keys are dropped, never planted in the filter") {
    import spark.implicits._
    val clean = keyed(0 until 50)
    val dirty = clean.union(Seq(null.asInstanceOf[String]).toDF("key"))
    assert(asMap(BloomSet.bloomOf(dirty, "key", M, K, shards = 2)) ==
      asMap(BloomSet.bloomOf(clean, "key", M, K, shards = 2)))
    // probe output carries no null-key row
    val bloom = BloomSet.bloomOf(clean, "key", M, K)
    assert(BloomSet.probe(dirty, "key", bloom, M, K)
      .where(col("key").isNull).count() == 0L)
    // and a pre-existing maybe_seen column is refused loudly
    intercept[IllegalArgumentException] {
      BloomSet.probe(clean.withColumn("maybe_seen", lit(true)),
        "key", bloom, M, K)
    }
  }
}
