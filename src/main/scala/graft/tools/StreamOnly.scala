package graft.tools
import org.apache.spark.sql.SparkSession
/** Quick standalone stream-peak probe (same path Bench's stream phase uses). */
object StreamOnly {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = graft.StreamPipelineBench.run(spark, nPages = 4800000L, cpus = cpus,
      filesPerTrigger = 24, nFiles = 96)
    println(f"[streamonly] sustained=${st.sustainedPps}%.0f pps p99=${st.p99Ms} wall=${st.wallSec}%.1f")
    spark.stop()
  }
}
