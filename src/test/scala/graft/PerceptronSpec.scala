package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LinearFilter, TextAnalysis}

/**
 * Batch integer perceptron (LinearFilter) — verified against an
 * independent in-spec reference (plain Scala over collected rows),
 * plus order/partitioning invariance (the bit-determinism contract),
 * convergence + early-stop on separable data, scoring, and the
 * ragged/validation edges.
 */
class PerceptronSpec extends SparkSpec {

  /** Independent reference: textbook batch perceptron over local data. */
  private def refTrain(rows: Seq[(Array[Long], Long)], dim: Int,
      epochs: Int): Array[Long] = {
    var w = new Array[Long](dim)
    var e = 0
    var done = false
    while (e < epochs && !done) {
      val mis = rows.filter { case (x, y) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
      }
      if (mis.isEmpty) done = true
      else w = w.indices.map(i =>
        w(i) + mis.map { case (x, y) => y * x(i) }.sum).toArray
      e += 1
    }
    w
  }

  private def df(rows: Seq[(Array[Long], Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (x, y) => (x.toSeq, y) }.toDF("x", "y")
  }

  private def randRows(seed: Long, n: Int, dim: Int): Seq[(Array[Long], Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (Array.fill(dim)((rnd.nextInt(7) - 3).toLong),
        if (rnd.nextBoolean()) 1L else -1L)
    }
  }

  test("train == independent reference on random data, any epoch count") {
    (1 to 5).foreach { round =>
      val rows = randRows(round, 60, 8)
      val epochs = round // 1..5
      val got = LinearFilter.train(df(rows), "x", "y", 8, epochs)
      assert(got.toSeq === refTrain(rows, 8, epochs).toSeq, s"round $round")
    }
  }

  test("weights are order- and partitioning-invariant (bit-determinism)") {
    val rows = randRows(42, 80, 6)
    val a = LinearFilter.train(df(rows).repartition(7), "x", "y", 6, 3)
    val b = LinearFilter.train(df(rows.reverse).coalesce(1), "x", "y", 6, 3)
    assert(a.toSeq === b.toSeq)
  }

  test("separable data converges and early-stops; score classifies it") {
    // y = sign(x0 - x1), margins >= 1 — classic separable set
    val rows = Seq[(Array[Long], Long)](
      (Array(3L, 1L), 1L), (Array(5L, 2L), 1L), (Array(2L, 0L), 1L),
      (Array(1L, 3L), -1L), (Array(0L, 4L), -1L), (Array(2L, 5L), -1L))
    val w = LinearFilter.train(df(rows), "x", "y", 2, epochs = 50)
    // early stop means extra epochs change nothing
    assert(w.toSeq === LinearFilter.train(df(rows), "x", "y", 2, 200).toSeq)
    val scored = LinearFilter.score(df(rows), "x", w)
      .select(col("y"), col("score")).collect()
    scored.foreach(r => assert(r.getLong(0) * r.getLong(1) > 0,
      s"misclassified: y=${r.getLong(0)} score=${r.getLong(1)}"))
  }

  test("all-zero features never converge the label but never crash; validation") {
    val rows = Seq[(Array[Long], Long)]((Array(0L, 0L), 1L), (Array(0L, 0L), -1L))
    val w = LinearFilter.train(df(rows), "x", "y", 2, 4)
    assert(w.toSeq === Seq(0L, 0L)) // updates cancel: (+1 - 1)·0
    intercept[IllegalArgumentException] {
      LinearFilter.train(df(rows), "x", "y", 2, 0)
    }
    // ragged feature width fails loudly — without the up-front check a
    // wide row would silently never vote (zip_with pads with nulls and
    // the null margin fails the misclassification filter)
    val s = spark
    import s.implicits._
    val ragged = Seq((Seq(1L, 2L), 1L), (Seq(1L, 2L, 3L), -1L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      LinearFilter.train(ragged, "x", "y", 2, 1)
    }
  }

  test("weight table round-trips; gapped/duplicated indices fail loudly") {
    val w = Array(3L, -2L, 0L, 7L)
    val back = LinearFilter.weightsFrom(
      LinearFilter.weightsDf(spark, w).orderBy(rand(5)))
    assert(back.toSeq === w.toSeq)
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      LinearFilter.weightsFrom(Seq((1L, 5L), (3L, 6L)).toDF("i", "w"))
    }
    intercept[IllegalArgumentException] {
      LinearFilter.weightsFrom(Seq((1L, 5L), (1L, 6L), (2L, 0L)).toDF("i", "w"))
    }
    intercept[IllegalArgumentException] {
      LinearFilter.weightsFrom(Seq.empty[(Long, Long)].toDF("i", "w"))
    }
  }

  test("the q102 composition trains on real features deterministically") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val f = TextAnalysis.hashedTfVector(docs, "doc_id", "text", 16)
      .join(docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y")), Seq("doc_id"))
    val w1 = LinearFilter.train(f, "tf_vec", "y", 16, 3)
    val w2 = LinearFilter.train(f.repartition(11), "tf_vec", "y", 16, 3)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.exists(_ != 0L)) // the en signal is learnable, not degenerate
  }
}
