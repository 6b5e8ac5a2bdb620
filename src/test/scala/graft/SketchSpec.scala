package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}

/** Sketch accuracy vs the exact operators (the oracle for approximate
  * ops is an error bound, not a hash). */
class SketchSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.01/documents.parquet")).cache()

  test("HLL distinct fingerprints within rsd bound of exact, per source") {
    import spark.implicits._
    val exact = docs
      .select($"source", TextAnalysis.fingerprint($"text").as("fp"))
      .groupBy($"source").agg(countDistinct($"fp").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinctFingerprints(docs.toDF(), "source", "text",
      rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      val a = approx(src)
      assert(math.abs(a - n) <= math.max(2.0, 4 * 0.05 * n),
        s"$src: approx $a vs exact $n out of bound")
    }
  }

  test("approx token percentiles bracket the exact ranks") {
    import spark.implicits._
    val toks = docs.select($"source", TextAnalysis.tokenCount($"text").as("toks"))
    val approx = Sketches.approxTokenQuantiles(docs.toDF(), "source", "text",
      probabilities = Seq(0.5), accuracy = 10000)
      .select($"source", element_at($"tok_quantiles", 1).as("p50"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // exact median per source for comparison
    val grouped = toks.collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getInt(1)).sorted }
    grouped.foreach { case (src, sorted) =>
      val lo = sorted((sorted.length * 0.45).toInt)
      val hi = sorted(math.min(sorted.length - 1, (sorted.length * 0.55).toInt))
      val a = approx(src)
      assert(a >= lo && a <= hi, s"$src: approx p50 $a outside exact [$lo, $hi]")
    }
  }

  test("frequent-terms sketch returns every truly frequent term (one-sided guarantee)") {
    import spark.implicits._
    val support = 0.01
    val terms = docs.select(explode(split(trim($"text"), "\\s+")).as("term"))
    val total = terms.count()
    val trulyFrequent = terms.groupBy($"term").count()
      .where($"count" > (total * support).toLong).select($"term")
      .as[String].collect().toSet
    val sketched = Sketches.frequentTerms(docs.toDF(), "text", support)
      .collect()(0).getSeq[String](0).toSet
    assert(trulyFrequent.nonEmpty, "corpus should have frequent terms at 1%")
    val missed = trulyFrequent -- sketched
    assert(missed.isEmpty, s"false negatives violate the KPS guarantee: ${missed.take(5)}")
  }

  test("sink time travel: readAsOf returns the table at an earlier epoch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tt").toString
    val sink = new graft.streaming.ExactlyOnceSink(dir)
    (0L until 4L).foreach(e => sink.write(Seq((e.toInt, s"v$e")).toDF("id", "v"), e))
    assert(sink.readAsOf(spark, 1L).collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))
    assert(sink.readAsOf(spark, 3L).count() == 4)
    // compaction trades per-epoch history for fewer files — loudly
    sink.compact(spark, 1)
    intercept[IllegalStateException] { sink.readAsOf(spark, 1L) }
    assert(sink.readAsOf(spark, 99L).count() == 4)
  }
}
