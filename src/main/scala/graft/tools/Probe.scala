package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.operators.LinkGraph

/** Scratch instrumentation main for optimization work — times plan
  * fragments in isolation with the noop sink. Not part of any contract. */
object Probe {
  def time(label: String, df: => DataFrame): Unit = {
    val d = df
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label%-30s best=${runs.min}%7.3f runs=${runs.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def linkPages = ev.select(
      concat(lit("h"), (col("user_id") % 50).cast(StringType),
        lit(".example.com")).as("host"),
      encode(concat(
        lit("<html><body><a href=\"https://h"),
        (col("event_id") % 50).cast(StringType),
        lit(".example.com/p?x=1\"> "), col("event_type"),
        lit(" </a> <A HREF='http://H"),
        ((col("event_id") + col("user_id")) % 50).cast(StringType),
        lit(".EXAMPLE.com:8080/q'>b</A><a href=\"/rel\">c</a></body></html>")),
        "UTF-8").as("html"))

    time("warmup-scan", ev)
    time("events-scan", ev)
    time("linkPages", linkPages)
    time("outlinks-extract", linkPages.select(col("host"),
      LinkGraph.outlinkUrls(col("html")).as("us")))
    time("outlinks-explode", linkPages.select(col("host"),
      explode(LinkGraph.outlinkUrls(col("html"))).as("u")))
    time("hostOf", linkPages.select(col("host"),
      explode(LinkGraph.outlinkUrls(col("html"))).as("u"))
      .select(col("host"), LinkGraph.hostOf(col("u")).as("d")))
    time("hostEdges-full", LinkGraph.hostEdges(linkPages, "html", "host"))
    val links = linkPages.select(col("host"),
      explode(LinkGraph.outlinkUrls(col("html"))).as("u"))
    time("hostOf-new-a", links.select(col("host"), LinkGraph.hostOf(col("u")).as("d")))
    time("hostOf-ref-a", links.select(col("host"), LinkGraph.hostOfRef(col("u")).as("d")))
    time("hostOf-new-b", links.select(col("host"), LinkGraph.hostOf(col("u")).as("d")))
    time("hostOf-ref-b", links.select(col("host"), LinkGraph.hostOfRef(col("u")).as("d")))
    def edgesWith(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        tag: String): Unit = {
      val sel = links.select(col("host").as("src_host"), f(col("u")).as("dst_host"))
      time(s"$tag-filter", sel.where(col("dst_host").isNotNull &&
        col("dst_host") =!= col("src_host")))
      time(s"$tag-group", sel.where(col("dst_host").isNotNull &&
        col("dst_host") =!= col("src_host"))
        .groupBy(col("src_host"), col("dst_host")).agg(count(lit(1)).as("n")))
    }
    edgesWith(LinkGraph.hostOf, "edges-new")
    edgesWith(LinkGraph.hostOfRef, "edges-ref")
    spark.stop()
  }
}
