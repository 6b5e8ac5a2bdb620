package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** SQL registration of the custom expressions via SparkSessionExtensions. */
class SqlSurfaceSpec extends AnyFunSuite {

  // getOrCreate may reuse the shared test session (extensions apply only
  // at build time), so exercise the explicit registration path — the same
  // expressions the extensions class injects
  private lazy val spark: SparkSession = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("extract_html_text callable from SQL and equal to the Scala function") {
    val row = spark.sql(
      "SELECT extract_html_text(cast('<p>a &amp; b</p>' as binary)) AS t")
      .collect()(0)
    assert(row.getString(0) == "a & b")
  }

  test("top_k aggregator registers as a SQL UDAF with partial aggregation") {
    import spark.implicits._
    graft.operators.TopK.registerSql(spark, 2)
    Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 9L), (1L, 13L, 1L), (2L, 20L, 7L))
      .toDF("k", "id", "score").createOrReplaceTempView("scores")
    val rows = spark.sql(
      "SELECT k, top_k_2(id, score) AS top FROM scores GROUP BY k ORDER BY k")
      .collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1)))
    // score DESC, id ASC tie-break: (11,9) before (12,9); (10,5) cut at k=2
    assert(top1 == Seq((11L, 9L), (12L, 9L)), s"got $top1")
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(20L))
    // the physical plan must reduce partially before the exchange
    val plan = spark.sql("SELECT k, top_k_2(id, score) FROM scores GROUP BY k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected object/sort aggregate with partial merge:\n$plan")
  }

  test("simhash64 / min_rolling_hash / dot_q / lsh_bucket callable from SQL") {
    val r = spark.sql(
      """SELECT simhash64('a b c') AS sh,
        |       min_rolling_hash('abcdefghijklmno') AS mrh,
        |       dot_q(array(cast(1.0 as float), cast(2.0 as float)),
        |             array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       lsh_bucket(array(cast(0.5 as float), cast(-0.5 as float)), 4) AS b
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.operators.SimHash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(r.getLong(2) == math.floor(3.0 * 1e6).toLong + math.floor(8.0 * 1e6).toLong)
    assert(r.getLong(3) >= 0 && r.getLong(3) < 16)
  }

  test("quality_score / lang_id / pq_adc callable from SQL") {
    val r = spark.sql(
      """SELECT quality_score('the cat and of is to in sat') AS q,
        |       lang_id('und der die nicht werden') AS l,
        |       pq_adc(array(array(10L, 20L), array(5L, 7L)), array(1, 0)) AS s
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == graft.operators.QualityScore.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("the cat and of is to in sat")))
    assert(r.getString(1) == "de")
    assert(r.getLong(2) == 20L + 5L) // lut[0][1] + lut[1][0]
    // SQL null semantics match the Column API: 0 / 'und', not NULL
    val n = spark.sql(
      "SELECT quality_score(cast(null as string)) AS q, lang_id(cast(null as string)) AS l")
      .collect()(0)
    assert(n.getInt(0) == 0 && n.getString(1) == "und")
  }

  test("minhash_band_sigs callable from SQL and equal to the md5 definition") {
    val r = spark.sql("SELECT minhash_band_sigs('a b c d', 3, 2) AS sigs").collect()(0)
    val sigs = r.getSeq[String](0)
    // shingles of 'a b c d' (n=3): {'a b c', 'b c d'}; sig(b) = min md5(shingle || '|' || b)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (0 until 2).map(b => Seq("a b c", "b c d").map(sh => md5hex(s"$sh|$b")).min)
    assert(sigs == expect, s"got $sigs expected $expect")
  }

  test("span_hashes / winnow_hashes callable from SQL and equal to the Column API") {
    val r = spark.sql(
      "SELECT span_hashes('a b c d', 3) AS sp, winnow_hashes('a b c d e f', 2, 3) AS wf")
      .collect()(0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getSeq[String](0) == Seq(md5hex("a b c"), md5hex("b c d")))
    // 5 bigram hashes, w=3: each window's rightmost min — must equal the
    // expression's own output through the Column API
    import spark.implicits._
    val viaColumn = Seq("a b c d e f").toDF("t")
      .select(graft.operators.Dedup.winnow_hashes($"t", 2, 3).as("wf"))
      .collect()(0).getSeq[String](0)
    assert(r.getSeq[String](1) == viaColumn && viaColumn.nonEmpty)
  }

  test("hashed_tf callable from SQL and equal to the md5 definition") {
    val r = spark.sql("SELECT hashed_tf('a b a', 8) AS v").collect()(0)
    val v = r.getSeq[Long](0)
    def h48(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val expect = Array.fill(8)(0L)
    Seq("a", "b", "a").foreach { t =>
      val h = h48(t)
      expect((h % 8).toInt) += (if (((h >> 20) & 1L) == 1L) 1L else -1L)
    }
    assert(v == expect.toSeq, s"got $v expected ${expect.toSeq}")
  }
}
