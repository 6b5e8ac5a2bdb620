package graft

import org.apache.spark.sql.functions._

import graft.operators.OrderStats

/** Exact distributed order statistics (the distinct-value-histogram
  * construction): brute-force oracle, type-1 edge semantics, and the
  * no-global-sort plan shape. */
class OrderStatsSpec extends SparkSpec {

  test("randomized brute-force oracle with heavy ties and a single-row group") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500)(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(12).toLong)) :+ ("solo", 7L)
    val qs = Seq(1, 250, 500, 750, 999, 1000)
    val got = OrderStats.exactQuantilesByGroup(rows.toDF("g", "v"), "g", "v", qs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val byG = rows.groupBy(_._1)
    for ((g, grp) <- byG; q <- qs) {
      val vs = grp.map(_._2).sorted
      val k = math.max(1, math.ceil(q * vs.size / 1000.0).toInt)
      assert(got((g, q)) == vs(k - 1), s"group $g q_pm=$q n=${vs.size}")
    }
    assert(got.size == byG.size * qs.size, "one row per (group, rank)")
  }

  test("type-1 semantics: even n takes the LOWER middle; q=1 the min; nulls excluded") {
    import spark.implicits._
    val df = Seq(("a", Option(4L)), ("a", Option(1L)), ("a", Option(3L)),
      ("a", Option(2L)), ("a", Option.empty[Long])).toDF("g", "v")
    val got = OrderStats.exactQuantilesByGroup(df, "g", "v", Seq(1, 500, 1000))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got(1) == 1L, "q_pm=1 is the minimum (rank ceil(n/1000)=1)")
    assert(got(500) == 2L, "even-n median is the lower middle element")
    assert(got(1000) == 4L, "q_pm=1000 is the maximum")
  }

  test("plan is histogram-shaped: no global range sort, rank join broadcast, partial aggs") {
    import spark.implicits._
    val df = Seq.tabulate(400)(i => (s"g${i % 3}", (i % 10).toLong)).toDF("g", "v")
    val out = OrderStats.exactQuantilesByGroup(df, "g", "v", Seq(500, 990))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), s"global sort leaked in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"rank table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked in:\n$p")
    assert(p.contains("partial_count"), s"histogram not map-side combined:\n$p")
    assert(p.contains("partial_min"), s"rank selection not map-side combined:\n$p")
  }

  test("bandGateVerdicts: inclusive endpoints, NULLs dropped, brute-force oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(400)(_ =>
      (s"g${rnd.nextInt(3)}", Option(rnd.nextInt(100).toLong))) :+
      ("g0", Option.empty[Long])
    val got = OrderStats.bandGateVerdicts(
        rows.toDF("g", "v"), "g", "v", loPm = 100, hiPm = 900)
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_ => r.getLong(1)),
        r.getBoolean(2))).toSeq
    val bounds = rows.filter(_._2.isDefined).groupBy(_._1).map { case (g, grp) =>
      val vs = grp.flatMap(_._2).sorted
      def at(q: Int) = vs(math.max(1, math.ceil(q * vs.size / 1000.0).toInt) - 1)
      g -> (at(100), at(900))
    }
    assert(got.size == rows.size, "verdict per input row, none dropped")
    for ((g, v, kept) <- got) {
      val want = v.exists(x => x >= bounds(g)._1 && x <= bounds(g)._2)
      assert(kept == want, s"($g, $v): kept=$kept want=$want")
    }
    // the band endpoints themselves survive their own gate
    val (lo0, hi0) = bounds("g0")
    assert(got.filter(r => r._1 == "g0" && r._2.exists(v => v == lo0 || v == hi0))
      .forall(_._3))
    // NULL value reads kept = false, never NULL
    assert(got.collect { case ("g0", None, k) => k } == Seq(false))
  }

  test("bandGateVerdicts plan: bounds broadcast back, corpus never shuffled") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => (s"g${i % 2}", (i % 50).toLong)).toDF("g", "v")
    val out = OrderStats.bandGateVerdicts(df, "g", "v", 50, 950)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bounds not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shuffled for the gate join:\n$p")
    intercept[IllegalArgumentException](
      OrderStats.bandGateVerdicts(df, "g", "v", 900, 900))
    intercept[IllegalArgumentException](OrderStats.bandGateVerdicts(
      df.withColumn("kept", lit(true)), "g", "v", 1, 1000))
  }

  test("histogramIncrement: ANY chunked build serves the same quantiles as one pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(600)(i => (i.toLong, s"g${rnd.nextInt(3)}",
      rnd.nextInt(40).toLong))
    val df = rows.toDF("id", "g", "v")
    val qs = Seq(100, 500, 900)
    val want = OrderStats.exactQuantilesByGroup(df, "g", "v", qs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (cut <- Seq(1L, 137L, 599L)) {
      val h1 = OrderStats.histogramOf(df.where($"id" < cut), "g", "v")
      val h2 = OrderStats.histogramIncrement(h1, df.where($"id" >= cut), "g", "v")
      val got = OrderStats.quantilesFromHistogram(h2, "g", "v", qs)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == want, s"chunked(cut=$cut) != one-pass")
      // the folded histogram is count-exact, not just quantile-exact
      assert(h2.agg(sum($"cnt")).collect().head.getLong(0) == rows.size)
    }
    // the documented precondition is real: a REPLAYED chunk inflates counts
    val h1 = OrderStats.histogramOf(df, "g", "v")
    val replayed = OrderStats.histogramIncrement(h1, df.where($"id" < 50), "g", "v")
    assert(replayed.agg(sum($"cnt")).collect().head.getLong(0) == rows.size + 50)
    intercept[IllegalArgumentException](OrderStats.histogramIncrement(
      h1.select($"v", $"g", $"cnt"), df, "g", "v"))
  }

  test("partitioning invariance and validation") {
    import spark.implicits._
    val rows = Seq.tabulate(300)(i => (s"g${i % 2}", (i % 7).toLong))
    val a = OrderStats.exactQuantilesByGroup(
      rows.toDF("g", "v").repartition(1), "g", "v", Seq(500))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val b = OrderStats.exactQuantilesByGroup(
      rows.toDF("g", "v").repartition(7, $"v"), "g", "v", Seq(500))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(a == b, "result must not depend on input partitioning")
    val df = rows.toDF("g", "v")
    intercept[IllegalArgumentException](
      OrderStats.exactQuantilesByGroup(df, "g", "v", Seq.empty))
    intercept[IllegalArgumentException](
      OrderStats.exactQuantilesByGroup(df, "g", "v", Seq(0)))
    intercept[IllegalArgumentException](
      OrderStats.exactQuantilesByGroup(df, "g", "v", Seq(1001)))
    intercept[IllegalArgumentException](
      OrderStats.exactQuantilesByGroup(df, "g", "v", Seq(500, 500)))
    // a fractional value column would be silently floor-truncated into
    // the long histogram — refused loudly instead
    intercept[IllegalArgumentException](OrderStats.exactQuantilesByGroup(
      df.withColumn("v", $"v" + 0.5), "g", "v", Seq(500)))
  }

  test("gateSweep: ≡ per-threshold recompute, monotone, nulls dropped, validation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(600)(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(5) * 20, 1L + rnd.nextInt(40))) :+
      ("solo", 40, 9L)
    val df = rows.toDF("g", "score", "toks")
    val got = OrderStats.gateSweep(df, "g", "score", "toks")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // every output row ≡ brute-force "keep score >= s" recompute
    val byG = rows.groupBy(_._1)
    for (((g, s), (nd, nt, kd, kt)) <- got) {
      val grp = byG(g)
      val grade = grp.filter(_._2.toLong == s)
      val kept = grp.filter(_._2.toLong >= s)
      assert((nd, nt) == (grade.size.toLong, grade.map(_._3).sum), s"($g,$s) grade")
      assert((kd, kt) == (kept.size.toLong, kept.map(_._3).sum), s"($g,$s) kept")
    }
    // one row per distinct (group, grade); curve monotone in the threshold
    assert(got.size == rows.map(r => (r._1, r._2)).distinct.size)
    for ((g, grp) <- got.groupBy(_._1._1)) {
      val byDescScore = grp.toSeq.sortBy(-_._1._2).map(_._2)
      assert(byDescScore.map(_._3) == byDescScore.map(_._3).sorted,
        s"$g kept_docs must grow as the threshold drops")
    }
    // null score / null tokens excluded up front
    val withNulls = df.unionByName(Seq(
      ("g0", null.asInstanceOf[Integer], java.lang.Long.valueOf(5L)),
      ("g0", Integer.valueOf(80), null.asInstanceOf[java.lang.Long]))
      .toDF("g", "score", "toks"))
    val gotN = OrderStats.gateSweep(withNulls, "g", "score", "toks")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(gotN == got, "null grades have no place on the curve")
    // partitioning invariance
    val got2 = OrderStats.gateSweep(
      df.orderBy(rand(5)).repartition(11), "g", "score", "toks")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got2 == got)
    // continuous score refused (histogram would degrade to row count)
    intercept[IllegalArgumentException](OrderStats.gateSweep(
      df.withColumn("score", $"score" + 0.5), "g", "score", "toks"))
    // persisted-index path: ANY chunked histogram build serves the same
    // curve as the direct sweep — the corpus is never re-read to answer
    // a threshold question
    val Array(c1, c2, c3) = df.randomSplit(Array(0.4, 0.3, 0.3), seed = 9)
    val hist = Seq(c2, c3).foldLeft(
      OrderStats.sweepHistogramOf(c1, "g", "score", "toks"))(
      (h, c) => OrderStats.sweepHistogramIncrement(h, c, "g", "score", "toks"))
    val served = OrderStats.gateSweepFromHistogram(hist, "g")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(served == got, "two-increment histogram must serve the direct curve")
    intercept[IllegalArgumentException](OrderStats.sweepHistogramIncrement(
      hist.withColumnRenamed("n_docs", "nd"), df, "g", "score", "toks"))
  }
}
