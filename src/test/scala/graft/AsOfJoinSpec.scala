package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, SkewAgg}

/** As-of join (union-trick) + salted shuffle join: semantics vs a
  * brute-force oracle, tie/NULL edges, and the scale-critical plan shape
  * (one key exchange, never a range/cartesian expansion). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*): DataFrame = // (id, key, tsUs)
    rows.toDF("id", "k", "tus").select($"id", $"k", timestamp_micros($"tus").as("ts"))

  private def right(rows: (Long, Long, Long)*): DataFrame = // (key, tsUs, payload)
    rows.toDF("k", "tus", "p").select($"k", timestamp_micros($"tus").as("ts"), $"p")

  private def run(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
    AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts")
      .select($"id", $"p").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap

  test("asOf: basic carry, tie at equal ts included, no-match is NULL") {
    val l = left((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 50L), (4L, 8L, 100L))
    val r = right((7L, 100L, 10L), (7L, 150L, 11L), (9L, 10L, 99L))
    val got = run(l, r)
    assert(got(1L) == Some(10L)) // equal ts: snapshot visible (>= rule)
    assert(got(2L) == Some(11L)) // latest of the two
    assert(got(3L) == None)      // nothing at or before
    assert(got(4L) == None)      // key has no snapshots at all
  }

  test("asOf: duplicate (key, ts) snapshots collapse to the max-struct winner") {
    val l = left((1L, 7L, 100L))
    val r = right((7L, 100L, 10L), (7L, 100L, 42L), (7L, 100L, 3L))
    assert(run(l, r)(1L) == Some(42L))
  }

  test("asOf: NULL-ts snapshots invisible; NULL-ts events unmatched") {
    val l = left((1L, 7L, 100L)).union(
      Seq(2L).toDF("id").select($"id", lit(7L).as("k"),
        lit(null).cast("timestamp").as("ts")))
    val r = right((7L, 50L, 10L)).union(
      Seq(1).toDF("x").select(lit(7L).as("k"),
        lit(null).cast("timestamp").as("ts"), lit(999L).as("p")))
    val got = run(l, r)
    assert(got(1L) == Some(10L)) // real snapshot still matched
    assert(got(2L) == None)      // NULL event time never matches
  }

  test("asOf: NULL payload field in the matched snapshot does NOT look through") {
    // snapshot at 100 has p = NULL; the older one at 50 has p = 7. An
    // event at 150 matches the 100-snapshot ROW, so p must be NULL —
    // per-column last(ignoreNulls) would wrongly resurrect 7.
    val l = left((1L, 7L, 150L))
    val r = Seq((7L, 50L, Some(7L)), (7L, 100L, None))
      .toDF("k", "tus", "p").select($"k", timestamp_micros($"tus").as("ts"), $"p")
    assert(run(l, r)(1L) == None)
  }

  test("asOf: randomized vs brute-force oracle; partitioning-invariant") {
    val rnd = new scala.util.Random(4242)
    val lRows = (1L to 400L).map(i =>
      (i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val rRows = (1L to 300L).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, i))
    // brute force: per left row, latest right with rts <= lts; ties on
    // (k, ts) resolved to max payload (the operator's max-struct rule)
    val collapsed = rRows.groupBy(t => (t._1, t._2)).map { case (kt, g) =>
      (kt._1, kt._2, g.map(_._3).max) }.toSeq
    val expect = lRows.map { case (id, k, lts) =>
      val cands = collapsed.filter(t => t._1 == k && t._2 <= lts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(t => (t._2, t._3))._3))
    }.toMap
    val got = run(left(lRows: _*), right(rRows: _*))
    assert(got == expect)
    val got2 = run(left(lRows: _*).repartition(7, $"id"),
      right(rRows: _*).repartition(3))
    assert(got2 == expect)
  }

  test("asOf plan: one key exchange per side, window carry, no range-join blowup") {
    val l = left((1L, 7L, 100L))
    val r = right((7L, 50L, 10L))
    val df = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of expanded to a product plan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"as-of should be union+window, not a join:\n$p")
    assert(p.contains("Window"), s"no window carry in plan:\n$p")
  }

  test("saltedJoin ≡ plain join on skewed keys; salt never leaks") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: 80% of rows on key 0
    val big = (1L to 1000L).map(i =>
      (i, if (rnd.nextDouble() < 0.8) 0L else rnd.nextInt(20).toLong))
      .toDF("id", "k")
    val dim = (0L to 19L).map(k => (k, k * 100)).toDF("k", "v")
    val salted = SkewAgg.saltedJoin(big, dim, Seq("k"), saltSrc = $"id", buckets = 8)
    assert(salted.columns.toSeq == Seq("k", "id", "v") ||
      !salted.columns.contains("_salt"))
    val plain = big.join(dim, Seq("k"))
    val a = salted.select($"id", $"k", $"v").collect().map(_.toSeq).sortBy(_.toString)
    val b = plain.select($"id", $"k", $"v").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("saltedJoin plan: shuffle keys include the salt (hot key fans out)") {
    val big = (1L to 100L).map(i => (i, i % 3)).toDF("id", "k")
    val dim = (0L to 2L).map(k => (k, k * 10)).toDF("k", "v")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = SkewAgg.saltedJoin(big, dim, Seq("k"), $"id", 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("_salt"), s"join not keyed by salt:\n$p")
    }
  }

  test("saltedJoin: non-key collision refused") {
    val big = Seq((1L, 2L, 3L)).toDF("id", "k", "v")
    val dim = Seq((2L, 9L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewAgg.saltedJoin(big, dim, Seq("k"), $"id", 4)
    }
  }
}
