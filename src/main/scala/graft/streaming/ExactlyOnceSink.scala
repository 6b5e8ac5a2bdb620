package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
 * recorded in the manifest atomically (write-temp + same-dir rename), and
 * a re-delivered epoch is skipped. Readers only see data whose manifest
 * entry exists ⇒ snapshot isolation over committed epochs.
 *
 * All manifest I/O goes through the Hadoop `FileSystem` API, so the table
 * can live on any Hadoop-supported store (`file://`, `hdfs://`, …) — the
 * transposition of the reference's pluggable connector plane
 * (`util/connector/ConnectorHolder.java:45-52`, `S3Connector.java`,
 * `FtpConnector.java`): where StormCV ships one connector class per
 * scheme, Hadoop's registry resolves the scheme from the URI.
 *
 * Object-store caveat (documented, as HDFS/POSIX semantics do NOT carry
 * over): on S3-style stores a "rename" is copy+delete — not atomic. There,
 * commit via a conditional PUT of the final manifest key instead
 * (S3A's create-with-overwrite=false maps to If-None-Match on recent
 * Hadoop), or front the manifest with a small transactional store. The
 * epoch protocol itself is unchanged — only the single "publish manifest
 * entry" primitive needs to be atomic.
 *
 * Layout:
 *   table/
 *     data/epoch=<batchId>/part-*.parquet   (per-epoch lineage)
 *     _manifest/epoch-<batchId>.json        (commit record, atomic)
 *
 * Per-partition lineage: the manifest records the epoch's row count; data
 * files are grouped per epoch directory, so any epoch can be audited or
 * replayed independently.
 */
class ExactlyOnceSink(tableDir: String) extends Serializable {

  private def manifestDir: Path = new Path(tableDir, "_manifest")
  private def epochManifest(batchId: Long): Path =
    new Path(manifestDir, f"epoch-$batchId%010d.json")

  /** Driver-side FS handle for the table's scheme (foreachBatch runs on
    * the driver; executors never touch the manifest). */
  private def fs(): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
    manifestDir.getFileSystem(conf)
  }

  def committed(batchId: Long): Boolean = fs().exists(epochManifest(batchId))

  def committedEpochs(): Seq[Long] = {
    val f = fs()
    if (!f.exists(manifestDir)) Nil
    else f.listStatus(manifestDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch-") && s.endsWith(".json") =>
        s.stripPrefix("epoch-").stripSuffix(".json").toLong }
      .sorted
  }

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
    val f = fs()
    f.mkdirs(manifestDir)
    val tmp = new Path(manifestDir, s".epoch-$batchId.json.tmp")
    val body =
      s"""{"epoch": $batchId, "rows": $count, "committed_at_batch": $batchId,
         | "data_path": "data/epoch=$batchId"}""".stripMargin
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    // same-dir rename: atomic on POSIX and HDFS; returns false if the
    // destination exists (a concurrent duplicate commit won the race)
    if (!f.rename(tmp, epochManifest(batchId))) f.delete(tmp, false)
  }

  /** Read back only committed epochs (snapshot over the manifest). */
  def read(spark: SparkSession): DataFrame = {
    val epochs = committedEpochs()
    if (epochs.isEmpty)
      throw new IllegalStateException(s"no committed epochs in $tableDir")
    val paths = epochs.map(e => s"$tableDir/data/epoch=$e")
    spark.read.parquet(paths: _*)
  }
}
