package graft

/**
 * The north rule's parallelism-invariance claim, asserted directly:
 * the same query over the same input produces IDENTICAL rows when the
 * shuffle partitioning changes (the local stand-in for running on a
 * differently-sized cluster). Holds because of the engine's determinism
 * rules — integer quantization before aggregation, µs timestamps, total
 * top-k orders (Queries.scala scaladoc); this spec is the regression
 * net over those rules.
 */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q01_pricing_summary",     // two-phase hash agg
    "q08_running_total",       // ordered window
    "q12_session_windows",     // gaps-and-islands sessions
    "q21_minhash_lsh_pairs",   // shingle joins + df cap + verify
    "q22_simhash_pairs",       // md5 signature votes + block join
    "q25_ann_lsh",             // md5 hyperplanes + multi-probe + top-k
    "q43_ivf_ann",             // argmax assignment + top-k
    "q44_near_dup_keepers",    // band self-join greedy rule
    "q45_prep_pipeline")       // composed pipeline

  test("representative queries are bit-identical across shuffle-partition counts") {
    val dir = sf("sf0.001")
    for (name <- names) {
      val q = Queries.all.find(_.name == name).get
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try q.fn(spark, dir).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", 4)
      }
      val a = run(3)
      val b = run(29)
      assert(a == b, s"$name diverges across partition counts: " +
        s"only-3=${(a.toSet -- b).take(2)} only-29=${(b.toSet -- a).take(2)}")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
