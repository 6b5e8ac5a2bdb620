package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ExtractHtmlText.extract_html_text
import graft.operators.{SkewAgg, Windows}
import graft.sources.{PageGen, PageGenConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query (SURVEY.md §7.2 vertical slice, batch form): generate a
   * deterministic page stream → extract text (Catalyst expression) →
   * per-host session windows → salted per-host rollup joined with session
   * counts. Exercises model, extraction, sessionization, skew handling.
   */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = PageGenConfig(nPages = 5000L, nHosts = 30, parallelism = 8)
    val pages = PageGen.rawPages(spark, cfg)
      .withColumn("text", extract_html_text(col("html")))
      .drop("html") // blob never carried past extraction (column pruning)
    val sessions = Windows.session(pages.toDF(), "warc_ts", "30 minutes",
      Seq(col("host")),
      Seq(count(lit(1)).as("n_pages"), sum(length(col("text"))).as("text_chars")))
    val perHost = SkewAgg.saltedAgg(sessions,
      keys = Seq(col("host")), saltSrc = col("s_start"), buckets = 8,
      partial = Seq(count(lit(1)).as("c"), sum(col("n_pages")).as("p"),
        sum(col("text_chars")).as("tc")),
      merge = Seq(sum(col("c")).as("n_sessions"), sum(col("p")).as("n_pages"),
        sum(col("tc")).as("text_chars")))
    perHost.orderBy(col("n_pages").desc, col("host").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every registry query carries one (none omitted). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
