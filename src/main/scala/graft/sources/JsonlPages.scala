package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.RawPage

/**
 * Newline-delimited-JSON page ingestion — the external-format fetcher
 * plane. Reference analog: `FileFrameFetcher`'s extension-filtered
 * directory expansion over foreign formats
 * (`fetcher/FileFrameFetcher.java:207-219`); a real Common-Crawl user
 * arrives with WARC/WET or JSONL, and this is the JSONL door into the
 * same [[graft.model.RawPage]] contract every downstream operator
 * (extraction, sessionization, dedup, prep pipeline) consumes. (No WARC
 * library exists in this environment; the record contract below is what
 * a WARC reader would also produce.)
 *
 * Line contract — one JSON object per line:
 *   {"url": "...", "host": "...", "warc_ts": "2026-01-01T00:00:00.000000Z",
 *    "html_b64": "<base64 of the raw bytes>"}
 *
 * `html` travels base64-encoded (JSON cannot carry raw bytes);
 * timestamps use an explicit microsecond format so the JSONL and
 * Parquet paths are value-identical down to event-time (the default
 * JSON timestamp format truncates to millis, which would silently shift
 * sessions and watermarks).
 *
 * Corrupt-record policy (explicit, not Spark's silent default):
 *  - `failOnCorrupt = false` (default): malformed lines and records
 *    missing any required field are DROPPED from the typed output;
 *    [[corruptLines]] audits them from the same directory.
 *  - `failOnCorrupt = true`: the first malformed line fails the query
 *    (FAILFAST), and so does a line that parses but misses a required
 *    field — for pipelines that would rather halt than sample-drop.
 *
 * Scale shape: the JSON source parallelizes by file; `maxFilesPerTrigger`
 * bounds a micro-batch. Decode cost (JSON + base64) is columnar and
 * codegen'd — no UDFs.
 */
object JsonlPages {

  final val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Read schema: required fields plus the corrupt-record capture slot. */
  val lineSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("host", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html_b64", StringType),
    StructField("_corrupt", StringType)))

  /** Serialize RawPage-shaped rows (url, host, warc_ts, html) to JSONL
    * text lines — the writer half of the contract (used by tests and by
    * exporters; also documents the exact line format). */
  def toJsonLines(pages: DataFrame): DataFrame =
    pages.select(to_json(struct(
      col("url"), col("host"), col("warc_ts"), base64(col("html")).as("html_b64")),
      java.util.Map.of("timestampFormat", TsFormat)).as("value"))

  private def decode(raw: DataFrame, spark: SparkSession,
      failOnCorrupt: Boolean): Dataset[RawPage] = {
    import spark.implicits._
    val incomplete = col("url").isNull || col("host").isNull ||
      col("warc_ts").isNull || col("html_b64").isNull
    val gated =
      if (failOnCorrupt)
        // FAILFAST only covers unparseable lines; a line that parses but
        // misses a required field must also halt in strict mode. The
        // check lives in a FILTER (not a dropped projection column) so
        // the optimizer cannot prune it away unevaluated.
        raw.where(when(incomplete, raise_error(concat(
          lit("JSONL record missing required field: "),
          to_json(struct(col("url"), col("host"), col("warc_ts")))))).otherwise(lit(true)))
      else raw.where(col("_corrupt").isNull && !incomplete)
    gated
      .select(col("url"), col("host"), col("warc_ts"),
        unbase64(col("html_b64")).as("html"))
      .as[RawPage]
  }

  private def readerOpts(failOnCorrupt: Boolean): Map[String, String] = Map(
    "timestampFormat" -> TsFormat,
    "mode" -> (if (failOnCorrupt) "FAILFAST" else "PERMISSIVE"),
    "columnNameOfCorruptRecord" -> "_corrupt")

  /** Batch ingestion of a JSONL directory (or glob). */
  def readPages(spark: SparkSession, dir: String,
      failOnCorrupt: Boolean = false): Dataset[RawPage] =
    decode(spark.read.options(readerOpts(failOnCorrupt)).schema(lineSchema).json(dir), spark, failOnCorrupt)

  /** Streaming ingestion: new JSONL files under `dir` become micro-batches
    * feeding the same typed contract as [[PageStream.fromRate]]. */
  def streamPages(spark: SparkSession, dir: String,
      failOnCorrupt: Boolean = false, maxFilesPerTrigger: Int = 0): Dataset[RawPage] = {
    val r = spark.readStream.options(readerOpts(failOnCorrupt)).schema(lineSchema)
    val withTrigger = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger.toString) else r
    decode(withTrigger.json(dir), spark, failOnCorrupt)
  }

  /** Audit of dropped lines: raw text of every line the permissive reader
    * rejected (parse failures and missing required fields). */
  def corruptLines(spark: SparkSession, dir: String): DataFrame = {
    val parsed = spark.read.options(readerOpts(failOnCorrupt = false))
      .schema(lineSchema).json(dir)
    parsed.where(col("_corrupt").isNotNull ||
        col("url").isNull || col("host").isNull ||
        col("warc_ts").isNull || col("html_b64").isNull)
      .select(coalesce(col("_corrupt"),
        to_json(struct(col("url"), col("host"), col("warc_ts"), col("html_b64"))))
        .as("line"))
  }
}
