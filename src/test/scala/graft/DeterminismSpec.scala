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

  test("EVERY registry query is bit-identical across shuffle-partition counts") {
    val dir = sf("sf0.001")
    for (q <- Queries.all) {
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try q.fn(spark, dir).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", 4)
      }
      val a = run(3)
      val b = run(29)
      assert(a == b, s"${q.name} diverges across partition counts: " +
        s"only-3=${(a.toSet -- b).take(2)} only-29=${(b.toSet -- a).take(2)}")
      assert(a.nonEmpty, s"${q.name} returned no rows")
    }
  }
}
