package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.RequestResponse
import graft.streaming.{ExactlyOnceSink, IndexMaintenance}

/**
 * The index-maintenance loop must (a) produce exactly the single-batch
 * index, (b) be idempotent and resumable with NO side-channel state
 * (the index table's manifest is the bookkeeping), and (c) fail loudly
 * when corpus compaction folded epochs it never indexed — plus recover
 * via the documented single-batch rebuild.
 */
class IndexMaintenanceSpec extends SparkSpec {

  private def docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "source", "text")

  private def shingleInc(df: DataFrame): DataFrame =
    RequestResponse.textIndexIncrement(df, "doc_id", "text", n = 2)

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("catchUp ≡ single-batch build; idempotent; resumes mid-loop; extends to new epochs") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("idxmnt").toString
    val corpus = new ExactlyOnceSink(s"$dir/corpus")
    val index = new ExactlyOnceSink(s"$dir/index")
    (0 to 2).foreach(e => corpus.write(docs.where(col("doc_id") % 4 === e), e.toLong))

    // simulate a maintainer crash AFTER epoch 0's increment committed:
    // the resumed catchUp must skip it (manifest = state) and do the rest
    index.write(shingleInc(corpus.readBetween(spark, -1L, 0L)), 0L)
    val first = IndexMaintenance.catchUp(spark, corpus, index)(shingleInc)
    assert(first == Seq(1L, 2L), s"resume must index exactly the gap, got $first")
    assert(rows(index.read(spark).select("doc_id", "shingle"))
      == rows(shingleInc(docs.where(col("doc_id") % 4 <= 2))))

    // caught up: a re-run is a no-op
    assert(IndexMaintenance.catchUp(spark, corpus, index)(shingleInc).isEmpty)

    // corpus grows; only the new epoch is read and indexed
    corpus.write(docs.where(col("doc_id") % 4 === 3), 3L)
    assert(IndexMaintenance.catchUp(spark, corpus, index)(shingleInc) == Seq(3L))
    assert(rows(index.read(spark).select("doc_id", "shingle")) == rows(shingleInc(docs)))

    // the maintained index serves identically to direct full-scan matching
    val reqs = docs.where(col("doc_id") < 3).select(col("doc_id"), col("text"))
    val viaIndex = RequestResponse.matchTextFromIndex(reqs,
      index.read(spark), "doc_id", "text", k = 3, n = 2)
    val direct = RequestResponse.matchText(spark, reqs, docs,
      "doc_id", "text", "doc_id", "text", k = 3, n = 2)
    assert(rows(viaIndex) == rows(direct) && rows(viaIndex).nonEmpty)
  }

  test("corpus compacted past unindexed epochs fails loudly; single-batch rebuild recovers") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("idxmntc").toString
    val corpus = new ExactlyOnceSink(s"$dir/corpus")
    val index = new ExactlyOnceSink(s"$dir/index")
    (0 to 1).foreach(e => corpus.write(docs.where(col("doc_id") % 3 === e), e.toLong))
    corpus.compact(spark, targetPartitions = 1)

    // epochs 0-1 folded into the snapshot before any increment was taken:
    // a silent no-op here would strand the index forever — must throw
    val e = intercept[IllegalStateException] {
      IndexMaintenance.catchUp(spark, corpus, index)(shingleInc)
    }
    assert(e.getMessage.contains("compacted"))

    // documented recovery: one single-batch increment over the snapshot,
    // committed under the compaction horizon — maintenance then resumes
    // for post-compaction epochs only
    val hi = corpus.compactHi().get
    index.write(shingleInc(corpus.read(spark)), hi)
    corpus.write(docs.where(col("doc_id") % 3 === 2), hi + 1)
    assert(IndexMaintenance.catchUp(spark, corpus, index)(shingleInc) == Seq(hi + 1))
    assert(rows(index.read(spark).select("doc_id", "shingle")) == rows(shingleInc(docs)))
  }
}
