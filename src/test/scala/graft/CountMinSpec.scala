package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-Min frequency sketch — round-5 addition. */
class CountMinSpec extends SparkSpec {

  /** zipf-ish stream: key i appears ~N/(i+1) times. */
  private def stream(nKeys: Int, scale: Int): DataFrame = {
    import spark.implicits._
    (0 until nKeys).flatMap(i => Seq.fill(scale / (i + 1))(s"key-$i"))
      .toDF("key")
  }

  private def cmsMap(cms: DataFrame): Map[(Long, Long), Long] = {
    import spark.implicits._
    cms.as[(Long, Long, Long)].collect()
      .map { case (r, c, n) => (r, c) -> n }.toMap
  }

  test("cms: never undercounts — est >= exact for every absorbed key") {
    val df = stream(200, 1000)
    val exact = df.groupBy(col("key")).agg(count(lit(1)).as("n"))
    val cms = CountMin.cmsOf(df, "key", wBits = 6, depth = 3)
    val bad = CountMin.estimate(exact, "key", cms, 6, 3)
      .where(col("est_count") < col("n")).count()
    assert(bad == 0L)
  }

  test("cms: tight sketch is exact; overloaded sketch overcounts, bounded") {
    val df = stream(50, 400)
    val exact = df.groupBy(col("key")).agg(count(lit(1)).as("n"))
    // 2^12 columns for 50 keys: collisions astronomically unlikely
    val tight = CountMin.estimate(exact, "key",
      CountMin.cmsOf(df, "key", 12, 3), 12, 3)
    assert(tight.where(col("est_count") =!= col("n")).count() == 0L)
    // 16 columns for 50 keys: collisions guaranteed, error still one-sided
    val loose = CountMin.estimate(exact, "key",
      CountMin.cmsOf(df, "key", 4, 3), 4, 3)
    assert(loose.where(col("est_count") < col("n")).count() == 0L)
    assert(loose.where(col("est_count") > col("n")).count() > 0L)
  }

  test("cms: unseen keys usually read 0 on a sparse sketch") {
    import spark.implicits._
    val cms = CountMin.cmsOf(stream(20, 100), "key", 10, 4)
    val fresh = (1000 until 1200).map(i => s"other-$i").toDF("key")
    val nonzero = CountMin.estimate(fresh, "key", cms, 10, 4)
      .where(col("est_count") > 0).count()
    // 20 keys over 1024 cols, depth 4: P(all 4 cells busy) ~ (20/1024)^4
    assert(nonzero == 0L, s"nonzero=$nonzero")
  }

  test("cms: increment ≡ batch; a REPLAYED chunk inflates (not idempotent)") {
    val a = stream(100, 300)
    val b = stream(100, 300) // same content = a disjoint second epoch here
    val whole = cmsMap(CountMin.cmsOf(a.union(b), "key", 6, 3))
    val inc = CountMin.cmsIncrement(
      CountMin.cmsOf(a, "key", 6, 3), b, "key", 6, 3)
    assert(cmsMap(inc) == whole)
    // the count-shaped-increment contract: replaying b doubles its mass
    val replay = cmsMap(CountMin.cmsIncrement(inc, b, "key", 6, 3))
    assert(replay != whole)
    val bMass = cmsMap(CountMin.cmsOf(b, "key", 6, 3)).values.sum
    assert(replay.values.sum == whole.values.sum + bMass)
  }

  test("cms: sketch invariant under input partitioning and order") {
    val df = stream(80, 500)
    val base = cmsMap(CountMin.cmsOf(df, "key", 6, 3))
    val scrambled = cmsMap(CountMin.cmsOf(
      df.orderBy(rand(3)).repartition(17), "key", 6, 3))
    assert(base == scrambled)
  }

  test("cms: bounded state — never more than depth * 2^wBits rows") {
    val cms = CountMin.cmsOf(stream(500, 2000), "key", 4, 3)
    assert(cms.count() <= 3L * 16L)
    assert(cms.where(col("col") < 0 || col("col") >= 16).count() == 0L)
    assert(cms.where(col("row") < 0 || col("row") >= 3).count() == 0L)
  }

  test("cms: parameter validation is loud") {
    val df = stream(5, 10)
    intercept[IllegalArgumentException] {
      CountMin.cmsOf(df, "key", wBits = 2, depth = 3)
    }
    intercept[IllegalArgumentException] {
      CountMin.cmsOf(df, "key", wBits = 8, depth = 0)
    }
  }

  test("cms: null keys dropped; est_count clash refused loudly") {
    import spark.implicits._
    val clean = stream(30, 100)
    val dirty = clean.union(Seq(null.asInstanceOf[String]).toDF("key"))
    assert(cmsMap(CountMin.cmsOf(dirty, "key", 6, 3)) ==
      cmsMap(CountMin.cmsOf(clean, "key", 6, 3)))
    intercept[IllegalArgumentException] {
      CountMin.estimate(clean.withColumn("est_count", lit(1L)),
        "key", CountMin.cmsOf(clean, "key", 6, 3), 6, 3)
    }
  }
}
