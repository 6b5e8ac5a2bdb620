package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ExtractHtmlText.extract_html_text

/** Throwaway diagnostic: which half of the time-sorted source is slow? */
object Bisect {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val files = new java.io.File(d).listFiles.map(_.getPath)
      .filter(_.endsWith(".parquet")).sorted
    def t(tag: String, fs: Seq[String], extract: Boolean): Unit = {
      val t0 = System.nanoTime
      val base = spark.read.parquet(fs: _*)
      val df = if (extract)
        base.select(length(extract_html_text(col("html"))).as("l"))
      else base.select(octet_length(col("html")).as("l"))
      val n = df.agg(sum(col("l")), count(lit(1))).collect()(0)
      println(f"[bisect] $tag: ${(System.nanoTime - t0) / 1e9}%.1f s ($n)")
    }
    t("scan_first128", files.take(128).toSeq, extract = false)
    t("scan_last128", files.drop(128).toSeq, extract = false)
    t("extract_first128", files.take(128).toSeq, extract = true)
    t("extract_last128", files.drop(128).toSeq, extract = true)
    t("extract_first128_b", files.take(128).toSeq, extract = true)
    t("extract_last128_b", files.drop(128).toSeq, extract = true)
    spark.stop()
  }
}
