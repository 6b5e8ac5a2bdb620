package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DistinctSketch

/** Portable HLL distinct sketch — round-5 addition. */
class DistinctSketchSpec extends SparkSpec {

  private def keyed(g: String, ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (g, s"key-$i")).toDF("grp", "key")
  }

  private def regMap(regs: DataFrame): Map[(String, Long), Long] = {
    import spark.implicits._
    regs.as[(String, Long, Long)].collect()
      .map { case (g, bkt, r) => (g, bkt) -> r }.toMap
  }

  test("hll: estimate within the error band at a real cardinality") {
    val df = keyed("a", 0 until 5000)
    val est = DistinctSketch.estimateDistinct(df, "grp", "key", b = 6)
      .select("est_distinct").head().getLong(0)
    // 1.04/sqrt(64) ≈ 13% 1σ + ≤1.5% integer quantization; allow 3σ
    assert(est > 3000 && est < 7000, s"est=$est")
  }

  test("hll: duplicates never move the estimate (distinct, not count)") {
    val once = keyed("a", 0 until 1000)
    val thrice = once.union(once).union(once)
    val e1 = DistinctSketch.estimateDistinct(once, "grp", "key", 6).collect()
    val e3 = DistinctSketch.estimateDistinct(thrice, "grp", "key", 6).collect()
    assert(e1.sameElements(e3))
  }

  test("hll: increment ≡ batch, replays absorbed, partitioning-invariant") {
    val a = keyed("g", 0 until 1500)
    val b = keyed("g", 1500 until 3000)
    val whole = regMap(DistinctSketch.registersOf(
      keyed("g", 0 until 3000), "grp", "key", 6))
    val inc = DistinctSketch.registersIncrement(
      DistinctSketch.registersOf(a, "grp", "key", 6), b, "grp", "key", 6)
    assert(regMap(inc) == whole)
    // re-deliver chunk b: max fold absorbs it
    val replay = DistinctSketch.registersIncrement(inc, b, "grp", "key", 6)
    assert(regMap(replay) == whole)
    // register table is a pure function of the key set
    val scrambled = regMap(DistinctSketch.registersOf(
      keyed("g", 0 until 3000).orderBy(rand(5)).repartition(11),
      "grp", "key", 6))
    assert(scrambled == whole)
  }

  test("hll: bounded state — at most 2^b rows per group, ranks in range") {
    val df = keyed("a", 0 until 20000).union(keyed("z", 0 until 7000))
    val regs = DistinctSketch.registersOf(df, "grp", "key", b = 4)
    val perGroup = regs.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ <= 16L), perGroup.toString)
    val rhoMax = 48 - 4 + 1
    assert(regs.where(col("rho") < 1 || col("rho") > rhoMax).count() == 0L)
    assert(regs.where(col("bucket") < 0 || col("bucket") >= 16).count() == 0L)
  }

  test("hll: groups are independent — per-group registers match solo runs") {
    val mixed = keyed("a", 0 until 800).union(keyed("b", 500 until 900))
    val aSolo = regMap(DistinctSketch.registersOf(
      keyed("a", 0 until 800), "grp", "key", 6))
    val together = regMap(DistinctSketch.registersOf(mixed, "grp", "key", 6))
    assert(together.filter(_._1._1 == "a") == aSolo)
  }

  test("hll: alpha rational hits the canonical constants") {
    assert(DistinctSketch.alphaMilli(6) == 709L)
    assert(DistinctSketch.alphaMilli(7) == 715L)
    intercept[IllegalArgumentException] {
      DistinctSketch.registersOf(keyed("a", 0 until 5), "grp", "key", 3)
    }
  }

  test("hll: null keys dropped; register-table name clashes refused") {
    import spark.implicits._
    val clean = keyed("a", 0 until 100)
    val dirty = clean.union(Seq(("a", null.asInstanceOf[String])).toDF("grp", "key"))
    assert(regMap(DistinctSketch.registersOf(dirty, "grp", "key", 6)) ==
      regMap(DistinctSketch.registersOf(clean, "grp", "key", 6)))
    intercept[IllegalArgumentException] {
      DistinctSketch.registersOf(clean.withColumnRenamed("grp", "bucket"),
        "bucket", "key", 6)
    }
  }
}
