package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.ExtractHtmlText.extract_html_text
import graft.sources.{JsonlPages, PageGen, PageGenConfig}
import graft.streaming.{ExactlyOnceSink, StreamDedup}

/**
 * JSONL ingestion must be value-identical to the Parquet path on the
 * same rows — timestamps to the microsecond, html to the byte — with an
 * explicit corrupt-line policy, and must feed the full streaming prep
 * pipeline interchangeably with a Parquet file stream.
 */
class JsonlPagesSpec extends SparkSpec {

  private val cfg = PageGenConfig(nPages = 400L, nHosts = 20, parallelism = 2)

  test("JSONL round trip: bytes and microseconds survive; corrupt lines drop with audit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    val orig = PageGen.rawPages(spark, cfg).toDF().cache()
    JsonlPages.toJsonLines(orig).coalesce(1).write.mode("overwrite").text(dir)
    // drop in two corrupt lines: unparseable JSON + a missing required field
    Files.write(Paths.get(dir, "bad.json"),
      "{not json at all\n{\"url\": \"https://x/1\", \"host\": \"x\"}\n".getBytes)

    val back = JsonlPages.readPages(spark, dir).toDF()
    val key = (d: org.apache.spark.sql.DataFrame) => d.select($"url", $"host",
      unix_micros($"warc_ts").as("us"), md5($"html").as("h")).collect().map(_.toSeq).toSet
    assert(key(back) == key(orig) && back.count() == 400)

    // the two bad lines are dropped from the typed path, audited verbatim-ish
    assert(JsonlPages.corruptLines(spark, dir).count() == 2)
    // strict mode fails loudly instead
    intercept[Exception] {
      JsonlPages.readPages(spark, dir, failOnCorrupt = true).count()
    }
    // strict mode must ALSO fail on a well-formed line missing a required
    // field (FAILFAST alone only covers unparseable JSON)
    val dir2 = Files.createTempDirectory("jsonl_mf").toString
    JsonlPages.toJsonLines(orig.limit(5)).coalesce(1).write.mode("overwrite").text(dir2)
    Files.write(Paths.get(dir2, "missing.json"),
      "{\"url\": \"https://x/1\", \"host\": \"x\"}\n".getBytes)
    intercept[Exception] {
      JsonlPages.readPages(spark, dir2, failOnCorrupt = true).count()
    }
    assert(JsonlPages.readPages(spark, dir2).count() == 5) // permissive drops it
  }

  test("full prep pipeline over a JSONL stream ≡ over a Parquet stream of the same rows") {
    import spark.implicits._
    val jsonlDir = Files.createTempDirectory("jsonl2").toString
    val pqDir = Files.createTempDirectory("pq2").toString
    val orig = PageGen.rawPages(spark, cfg).toDF().cache()
    JsonlPages.toJsonLines(orig).coalesce(1).write.mode("overwrite").text(jsonlDir)
    orig.coalesce(1).write.mode("overwrite").parquet(pqDir)

    def runPipeline(pages: org.apache.spark.sql.DataFrame, tag: String): Set[Seq[Any]] = {
      val cp = Files.createTempDirectory(s"cp$tag").toString
      val table = Files.createTempDirectory(s"tbl$tag").toString
      val sink = new ExactlyOnceSink(table)
      val extracted = pages
        .withColumn("text", extract_html_text(col("html")))
        .drop("html")
      val out = StreamDedup.prepPipeline(extracted, "url", "text", "warc_ts",
        delay = "30 minutes", horizonUs = 7200L * 1000000L)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink.write(StreamDedup.keptInBatch(df.toDF()), id))
        .start()
      q.awaitTermination()
      // keptInBatch emits the generic (id, ts) survivor contract
      sink.read(spark).select($"id", unix_micros($"ts").as("us"))
        .collect().map(_.toSeq).toSet
    }

    val fromJsonl = runPipeline(JsonlPages.streamPages(spark, jsonlDir).toDF(), "j")
    val fromParquet = runPipeline(
      spark.readStream.schema(orig.schema).parquet(pqDir), "p")
    assert(fromJsonl == fromParquet && fromJsonl.nonEmpty,
      s"jsonl=${fromJsonl.size} parquet=${fromParquet.size}")
  }
}
