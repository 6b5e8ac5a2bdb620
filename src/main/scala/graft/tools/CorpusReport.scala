package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * One-look corpus quality report — the operational dashboard a pipeline
 * owner reads before an export: volume, language mix, quality
 * distribution, exact-dup rate, PII incidence, repetition flags, and
 * rare-token (OOV) mass, all composed from the engine's own gate
 * operators so the report and the gates can never disagree. Prints ONE
 * JSON object to stdout.
 *
 * Cost shape: two corpus passes — one projection+aggregate pass for
 * every per-row signal (the gates are codegen'd expressions, evaluated
 * in the scan stage), plus the lexicon build that the rare-token signal
 * needs (its own groupBy pass, the same table
 * [[TextAnalysis.lexiconIncrement]] would maintain incrementally in
 * production — pass a persisted lexicon dir as args(1) to skip it).
 *
 *   sbt "runMain graft.tools.CorpusReport [sfDir] [lexiconDir]"
 */
object CorpusReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (emails, ips, phones) = TextAnalysis.piiCounts(col("text"))
    val words = TextAnalysis.wordArray(col("text"))
    val row = docs.select(
      col("doc_id"), col("lang"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("toks"),
      length(col("text")).as("chars"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      emails.as("pii_email"), ips.as("pii_ip"), phones.as("pii_phone"),
      // Gopher-style repetition: fraction of words that are the single
      // most common word, flagged above 200 permille
      (lit(1000) * TextAnalysis.topWordCount(words) /
        greatest(size(words), lit(1))).cast("long").as("rep_q"))

    val totals = row.agg(
      count(lit(1)).as("docs"),
      sum($"toks").as("tokens"),
      sum($"chars").as("chars"),
      countDistinct($"fp").as("distinct_fp"),
      sum($"pii_email").as("pii_emails"),
      sum($"pii_ip").as("pii_ips"),
      sum($"pii_phone").as("pii_phones"),
      sum(when($"rep_q" >= 200, 1L).otherwise(0L)).as("repetitive_docs"),
      sum(when($"q" < 50, 1L).otherwise(0L)).as("low_quality_docs"))
      .head()

    val langMix = row.groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"toks").as("toks"))
      .orderBy($"toks".desc)
      .as[(String, Long, Long)].collect()
    val qHist = row.groupBy(($"q" / 10).cast("long").as("decile"))
      .agg(count(lit(1)).as("n")).orderBy($"decile")
      .as[(Long, Long)].collect()
    val worstSources = graft.operators.Dedup
      .dupRateByGroup(docs, "doc_id", "text", "source", maxDupQ = 100)
      .orderBy($"dup_q".desc, $"source").limit(5)
      .select($"source", $"dup_q").as[(String, Long)].collect()

    // rare-token mass off the lexicon (persisted if provided, else built)
    val lexicon = args.lift(1)
      .map(dir => spark.read.parquet(dir))
      .getOrElse(TextAnalysis.termFrequencies(docs, "text"))
    val oov = TextAnalysis.rareTokenStats(docs, "doc_id", "text", lexicon, 3L)
      .agg(sum($"rare_toks").as("rare"), sum($"n_toks").as("all"),
        sum(when($"rare_q" >= 500, 1L).otherwise(0L)).as("oov_docs"))
      .head()

    def jStr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val langJson = langMix.map { case (l, n, t) =>
      s"{${jStr(l)}:{" + s""""docs":$n,"tokens":$t}}""" }.mkString("[", ",", "]")
    val histJson = qHist.map { case (d, n) => s"""{"decile":$d,"docs":$n}""" }
      .mkString("[", ",", "]")
    val worstJson = worstSources.map { case (s, d) =>
      s"{${jStr(s)}:$d}" }.mkString("[", ",", "]")
    val dupPm = 1000L * (totals.getLong(0) - totals.getLong(3)) /
      math.max(totals.getLong(0), 1L)
    println(
      s"""{"docs":${totals.getLong(0)},"tokens":${totals.getLong(1)},""" +
      s""""chars":${totals.getLong(2)},"exact_dup_pm":$dupPm,""" +
      s""""pii":{"emails":${totals.getLong(4)},"ips":${totals.getLong(5)},""" +
      s""""phones":${totals.getLong(6)}},""" +
      s""""repetitive_docs":${totals.getLong(7)},""" +
      s""""low_quality_docs":${totals.getLong(8)},""" +
      s""""oov":{"rare_tokens":${oov.getLong(0)},"all_tokens":${oov.getLong(1)},""" +
      s""""flagged_docs":${oov.getLong(2)}},""" +
      s""""lang_mix":$langJson,"quality_deciles":$histJson,""" +
      s""""worst_dup_sources":$worstJson}""")
    spark.stop()
  }
}
