package graft

import org.apache.spark.sql.functions._

import graft.operators.DecayedCounts

/** Epoch-decayed counters: scalar-fold oracle, shift-semantics edges,
  * partitioning invariance. */
class DecayedCountsSpec extends SparkSpec {

  /** The operator's contract as a plain Scala fold. */
  private def reference(rows: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    rows.groupBy(_._1).map { case (k, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val folded = counts.foldLeft((Option.empty[Long], 0L)) {
        case ((pe, s), (e, c)) =>
          val dec = pe match {
            case Some(p) if e - p < 63 => s >> (e - p).toInt
            case _ => 0L
          }
          (Some(e), dec + c)
      }
      k -> (folded._1.get, folded._2)
    }

  private def run(rows: Seq[(Long, Long)], partitions: Int = 4): Map[Long, (Long, Long)] = {
    import spark.implicits._
    DecayedCounts.decayedByKey(
        rows.toDF("k", "e").repartition(partitions), "k", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("hand cases: burst halves per idle epoch, gaps fold in one shift, 63+ zeroes") {
    // one key, counts 5@e1, 2@e3, 7@e4: ((5>>2)+2)>>1 + 7 = 8
    val burst = Seq.fill(5)((1L, 1L)) ++ Seq.fill(2)((1L, 3L)) ++ Seq.fill(7)((1L, 4L))
    assert(run(burst) == Map(1L -> ((4L, 8L))))
    // ancient burst is a hard zero across a 100-epoch gap (no %64 wrap:
    // a mod-64 shift would read 100 % 64 = 36 and leak score through)
    val ancient = Seq.fill(1000)((2L, 0L)) :+ ((2L, 100L))
    assert(run(ancient) == Map(2L -> ((100L, 1L))))
    // negative epochs fold fine: 2@-5 halves to 1 across the 1-epoch
    // gap, +1 at -4
    assert(run(Seq((3L, -5L), (3L, -5L), (3L, -4L))) == Map(3L -> ((-4L, 2L))))
    // single epoch: score = raw count
    assert(run(Seq((4L, 9L), (4L, 9L))) == Map(4L -> ((9L, 2L))))
  }

  test("randomized: operator equals the scalar fold, any partitioning") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(3000)((rnd.nextInt(40).toLong,
      (rnd.nextInt(30) + (if (rnd.nextBoolean()) 0 else 70)).toLong))
    val want = reference(rows)
    assert(run(rows, 1) == want)
    assert(run(rows, 16) == want)
    // fractional epochs would bucket events wrongly under silent floor
    import spark.implicits._
    intercept[IllegalArgumentException](DecayedCounts.decayedByKey(
      rows.toDF("k", "e").withColumn("e", $"e" + 0.25), "k", "e"))
  }

  test("topAtHorizon: newest row wins, future rows excluded, ties break on key") {
    import spark.implicits._
    val log = Seq(
      ("a", 10L, 9L), ("a", 12L, 6L),   // newest <= horizon: (12, 6)
      ("b", 13L, 24L),                  // decays 2 epochs: 24 >> 2 = 6
      ("b", 16L, 99L),                  // FUTURE row (> horizon): excluded
      ("c", 15L, 7L),                   // at the horizon: no decay
      ("d", 1L, 1000000L)               // ancient: stays (gap 14 < 63) -> 61
    ).toDF("k", "epoch", "score")
    val got = DecayedCounts.topAtHorizon(log, "k", horizon = 15L, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // d: 1000000 >> 14 = 61; c: 7; ties between a (6 @12>>3 ... wait: a
    // decays (15-12)=3 -> 6>>3 = 0; b: 6. Order: d(61), c(7), b(6)
    assert(got == Seq(("d", 1L, 61L), ("c", 15L, 7L), ("b", 13L, 6L)), got.toString)
    // ties: equal scores rank bytewise by key
    val ties = Seq(("x", 5L, 4L), ("w", 5L, 4L), ("y", 5L, 4L)).toDF("k", "epoch", "score")
    val t = DecayedCounts.topAtHorizon(ties, "k", 5L, 2)
      .collect().map(_.getString(0)).toSeq
    assert(t == Seq("w", "x"))
    // plan: top-k must be TakeOrderedAndProject, never a global sort
    val p = DecayedCounts.topAtHorizon(log, "k", 15L, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"global sort leaked in:\n$p")
    intercept[IllegalArgumentException](DecayedCounts.topAtHorizon(log, "k", 15L, 0))
  }

  test("serving at a horizon is one more shift (the fold's own step)") {
    // score at horizon h = decay(score, h - last_epoch): check against a
    // reference fold that includes an empty horizon epoch
    val rows = Seq.fill(9)((1L, 10L)) ++ Seq.fill(4)((1L, 12L))
    val (le, s) = run(rows)(1L)
    assert((le, s) == ((12L, (9L >> 2) + 4L)))
    val atHorizon = s >> (15 - le).toInt
    // folding an explicit count-0 epoch at 15 gives the same number
    val withEmpty = reference(rows :+ ((1L, 15L)))(1L)._2 - 1L // minus the probe event
    assert(atHorizon == withEmpty)
  }
}
