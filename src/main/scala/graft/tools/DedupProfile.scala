package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Diagnostic: where q21's wall time goes, stage by stage (off hot path). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // warm-up
    docs.count()
    time("docs.count (warm)") { docs.count() }
    time("explode, no distinct") {
      docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+"))).count() }
    time("shingles no-distinct") {
      import org.apache.spark.sql.types._
      val d2 = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      d2.select(col("doc_id"), explode(org.apache.spark.sql.functions.when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
        .otherwise(array().cast("array<string>"))).as("shingle")).count() }
    time("shingles(distinct)") {
      Dedup.cappedShingles(docs, "doc_id", "text", 3, 0).count() }
    time("cappedShingles(df50)") {
      Dedup.cappedShingles(docs, "doc_id", "text", 3, 50).count() }
    time("minhashBands(8)") {
      Dedup.minhashBandsFromShingles(
        Dedup.cappedShingles(docs, "doc_id", "text", 3, 50), "doc_id", 8).count() }
    time("full q21") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 500, 50).count() }
    spark.stop()
  }
}
