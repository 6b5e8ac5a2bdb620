package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

class LanguageModelSpec extends SparkSpec {

  test("bigramIncrement: counts, short docs skipped, fold == single build") {
    import spark.implicits._
    val a = Seq("the cat sat", "the cat").toDF("text")
    val b = Seq("the cat sat on", "one", "", "  ").toDF("text")
    val full = Seq("the cat sat", "the cat", "the cat sat on", "one", "", "  ")
      .toDF("text")
    val folded = LanguageModel.foldCounts(
        LanguageModel.bigramIncrement(a, "text"),
        LanguageModel.bigramIncrement(b, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val once = LanguageModel.bigramIncrement(full, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded === once)
    assert(folded === Map("the cat" -> 3L, "cat sat" -> 2L, "sat on" -> 1L))
  }

  test("scoreDocs: hand-computed smoothed likelihoods, unseen handling") {
    import spark.implicits._
    // model: "the cat"->3, "cat sat"->2, "sat on"->1
    //   c1: the->3, cat->2, sat->1;  V = |{cat, sat, on}| + 1 = 4
    val model = LanguageModel.bigramIncrement(
      Seq("the cat sat", "the cat", "the cat sat on").toDF("text"), "text")
    val docs = Seq(
      (1L, "the cat sat"),      // p(cat|the)=(3+1)/(3+4), p(sat|cat)=(2+1)/(2+4)
      (2L, "the dog"),          // seen w1, unseen bigram: (0+1)/(3+4)
      (3L, "dog barks"),        // unseen w1: (0+1)/(0+4)
      (4L, "one"),              // no bigrams -> no row
      (5L, "")                  // no bigrams -> no row
    ).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocs(docs, model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val p_theCat = 1000000L * 4 / 7   // 571428
    val p_catSat = 1000000L * 3 / 6   // 500000
    val p_theDog = 1000000L * 1 / 7   // 142857
    val p_unseen = 1000000L * 1 / 4   // 250000
    assert(got === Map(
      1L -> ((2L, (p_theCat + p_catSat) / 2)),
      2L -> ((1L, p_theDog)),
      3L -> ((1L, p_unseen))))
  }

  test("tierByCutoffs: row-local case over frozen cutoffs") {
    import spark.implicits._
    val scored = Seq((1L, 2L, 40000L), (2L, 2L, 33000L), (3L, 2L, 100L))
      .toDF("doc_id", "n_bigrams", "lm_q")
    val got = LanguageModel.tierByCutoffs(scored, 34000L, 32700L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("scoreDocs: model columns never collide with corpus columns") {
    import spark.implicits._
    // corpus carrying its own c2/c1/w1/v columns must not break the joins
    // (scoreDocs projects to (doc_id, bg, w1) before touching the model)
    val model = LanguageModel.bigramIncrement(Seq("a b c").toDF("text"), "text")
    val docs = Seq((1L, "a b c", 9L, 9L, "x", 9L))
      .toDF("doc_id", "text", "c2", "c1", "w1", "v")
    val got = LanguageModel.scoreDocs(docs, model, "doc_id", "text").collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L)
  }

  test("lmScoreProbe: broadcast-decomposed sum == batch scorer, null for unscoreable") {
    import spark.implicits._
    import graft.operators.RequestResponse
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select($"doc_id", $"text")
    val model = LanguageModel.bigramIncrement(
      docs.where($"doc_id" % 3 === 0), "text")
    val reqs = docs.where($"doc_id" < 40)
      .unionByName(Seq((9001L, "one"), (9002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val got = RequestResponse.lmScoreProbe(reqs,
        LanguageModel.enrichModel(model), LanguageModel.c1Of(model),
        LanguageModel.vocabPlusOne(model),
        "doc_id", "text", 34000L, 32700L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2),
          r.getString(3)))).toMap
    // scoreable requests: identical to the batch scorer + tier
    val want = LanguageModel.tierByCutoffs(
        LanguageModel.scoreDocs(docs.where($"doc_id" < 40), model,
          "doc_id", "text"), 34000L, 32700L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2): Any, r.getString(3)))).toMap
    assert(want.nonEmpty && want.forall { case (k, v) => got.get(k).contains(v) },
      s"probe != batch scorer")
    // unscoreable requests still answered, with NULL score/tier
    assert(got(9001L) === ((0L, null, null)))
    assert(got(9002L) === ((0L, null, null)))
    assert(got.size == want.size + 2)
  }

  test("importanceWeights ≡ two scoreDocs runs; sign separates target-like from raw-like") {
    import spark.implicits._
    val target = LanguageModel.bigramIncrement(
      Seq("the cat sat", "the cat sat on the mat").toDF("text"), "text")
    val raw = LanguageModel.bigramIncrement(
      Seq("zz qq rr", "qq rr zz qq").toDF("text"), "text")
    val docs = Seq(
      (1L, "the cat sat"),   // target-like: dsir_q > 0
      (2L, "qq rr zz"),      // raw-like: dsir_q < 0
      (3L, "the dog barks"), // partially unseen in both
      (4L, "one"), (5L, "")  // no bigrams -> no row
    ).toDF("doc_id", "text")
    val iw = LanguageModel.importanceWeights(docs, target, raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def scored(m: org.apache.spark.sql.DataFrame) =
      LanguageModel.scoreDocs(docs, m, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val st = scored(target); val sr = scored(raw)
    assert(iw.keySet === Set(1L, 2L, 3L))
    iw.foreach { case (id, (n, wt, wr, d)) =>
      assert((n, wt) === st(id), s"doc $id: w_target != scoreDocs(target)")
      assert((n, wr) === sr(id), s"doc $id: w_raw != scoreDocs(raw)")
      assert(d === wt - wr, s"doc $id: dsir_q != difference")
    }
    assert(iw(1L)._4 > 0, "target-like doc must score positive")
    assert(iw(2L)._4 < 0, "raw-like doc must score negative")
  }

  test("likelihoodCutoffs: terciles of the score column") {
    import spark.implicits._
    val scored = (1L to 9L).map(i => (i, 1L, i * 1000L))
      .toDF("doc_id", "n_bigrams", "lm_q")
    val (h, m) = LanguageModel.likelihoodCutoffs(scored)
    assert(h >= m && m >= 1000L && h <= 9000L)
  }
}
