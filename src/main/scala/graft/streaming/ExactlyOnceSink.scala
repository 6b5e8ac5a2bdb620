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

  // compactHi changes only when compact() publishes a snapshot; caching it
  // keeps committed() at one O(1) exists() probe per micro-batch instead of
  // a full _manifest listing (O(epochs) per batch on an object store).
  // null = never loaded. Single-maintainer assumption: if ANOTHER process
  // compacts while this writer streams, call refreshCompactHi() (but
  // concurrent external compaction against a live writer is out of
  // contract anyway — see compact()).
  @transient private var hiCache: Option[Long] = _

  private def compactHiCached(): Option[Long] = {
    if (hiCache == null) hiCache = compactHi()
    hiCache
  }

  /** Drop the cached snapshot horizon (e.g. after an external compaction). */
  def refreshCompactHi(): Unit = hiCache = null

  /** Epoch is committed if its manifest exists OR a compacted snapshot
    * covers it (compaction GCs the per-epoch manifests it supersedes). */
  def committed(batchId: Long): Boolean =
    batchId <= compactHiCached().getOrElse(-1L) || fs().exists(epochManifest(batchId))

  def committedEpochs(): Seq[Long] = {
    val f = fs()
    if (!f.exists(manifestDir)) Nil
    else f.listStatus(manifestDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch-") && s.endsWith(".json") =>
        s.stripPrefix("epoch-").stripSuffix(".json").toLong }
      .sorted
  }

  /** Highest epoch covered by a compacted snapshot, if any. */
  def compactHi(): Option[Long] = {
    val f = fs()
    if (!f.exists(manifestDir)) None
    else f.listStatus(manifestDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("compact-") && s.endsWith(".json") =>
        s.stripPrefix("compact-").stripSuffix(".json").toLong }
      .sorted.lastOption
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
    // per-partition lineage: the exact files this epoch committed, so any
    // epoch is auditable/replayable from its manifest entry alone
    val files = f.listStatus(new Path(dataPath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("part-")).sorted
    val body =
      s"""{"epoch": $batchId, "rows": $count, "committed_at_batch": $batchId,
         | "data_path": "data/epoch=$batchId",
         | "files": [${files.map(n => "\"" + n + "\"").mkString(", ")}]}""".stripMargin
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    // same-dir rename: atomic on POSIX and HDFS; returns false if the
    // destination exists (a concurrent duplicate commit won the race)
    if (!f.rename(tmp, epochManifest(batchId))) f.delete(tmp, false)
  }

  /** Read back only committed data: the newest compacted snapshot (if
    * any) plus every epoch committed after it. */
  def read(spark: SparkSession): DataFrame = {
    val hi = compactHi()
    val epochs = committedEpochs().filter(e => hi.forall(e > _))
    val paths = hi.map(h => s"$tableDir/data/compact-$h").toSeq ++
      epochs.map(e => s"$tableDir/data/epoch=$e")
    if (paths.isEmpty)
      throw new IllegalStateException(s"no committed epochs in $tableDir")
    spark.read.parquet(paths: _*)
  }

  /**
   * Time travel: the table as of a given epoch (snapshot isolation over
   * the manifest — Iceberg's `VERSION AS OF`, at commit-epoch
   * granularity). Per-epoch history survives until a compaction GC's the
   * manifests it supersedes; asking for an epoch below the newest
   * snapshot's hi fails loudly rather than returning merged data.
   */
  def readAsOf(spark: SparkSession, asOfEpoch: Long): DataFrame = {
    compactHi().filter(_ > asOfEpoch).foreach { h =>
      throw new IllegalStateException(
        s"history up to epoch $h was compacted away; cannot read as-of $asOfEpoch")
    }
    val epochs = committedEpochs().filter(_ <= asOfEpoch)
    val hi = compactHi().filter(_ <= asOfEpoch)
    val paths = hi.map(h => s"$tableDir/data/compact-$h").toSeq ++
      epochs.filter(e => hi.forall(e > _)).map(e => s"$tableDir/data/epoch=$e")
    if (paths.isEmpty)
      throw new IllegalStateException(s"no epochs committed at or before $asOfEpoch")
    spark.read.parquet(paths: _*)
  }

  /**
   * Incremental scan: rows committed in epochs `(afterEpoch, untilEpoch]`
   * — Iceberg's incremental read between two snapshots, at commit-epoch
   * granularity. The unit a downstream consumer (compactor, index
   * builder, CDC-style replicator) uses to process ONLY what is new
   * since its last run instead of rescanning the table. Fails loudly if
   * compaction already folded part of the requested range (per-epoch
   * lineage for that range is gone).
   */
  def readBetween(spark: SparkSession, afterEpoch: Long,
      untilEpoch: Long = Long.MaxValue): DataFrame = {
    // list FIRST, check the compaction horizon AFTER: a concurrent
    // compaction between the two calls then fails the guard instead of
    // making the listing silently empty (manifests GC'd) — the loud
    // failure this method promises. Data dirs survive compaction until
    // the separate GC step, so a listing that passed the guard reads
    // consistent data.
    val epochs = committedEpochs().filter(e => e > afterEpoch && e <= untilEpoch)
    compactHi().filter(_ > afterEpoch).foreach { h =>
      throw new IllegalStateException(
        s"epochs <= $h were compacted away; incremental read after $afterEpoch is no longer exact")
    }
    if (epochs.isEmpty) {
      // caught up: zero rows with the real table schema; a table with no
      // commits at all has no schema yet — that's "producer not started",
      // not an error, so hand back an empty frame the poller can retry on
      return if (committedEpochs().nonEmpty || compactHi().nonEmpty)
        read(spark).limit(0)
      else spark.emptyDataFrame
    }
    spark.read.parquet(epochs.map(e => s"$tableDir/data/epoch=$e"): _*)
  }

  /**
   * Compact all currently committed data into one snapshot with
   * `targetPartitions` files — the table-maintenance half of the
   * "Iceberg subset": a streaming sink accretes one small directory per
   * micro-batch (at 100 TB/day that is thousands of undersized files a
   * day), and scan cost is dominated by file count.
   *
   * Protocol (same atomic-publish discipline as `write`):
   *   1. rewrite the current `read()` view to `data/compact-<hi>`;
   *   2. publish `compact-<hi>.json` atomically (one rename — readers
   *      see the old epochs or the snapshot, never a mix);
   *   3. GC the superseded manifests (covered epochs + older compacts).
   *      Their data dirs are left for in-flight readers; a later
   *      compaction run or external GC can remove them once no reader
   *      can hold the old manifest list.
   *
   * Safe vs re-delivery: `committed` treats every epoch ≤ the snapshot's
   * hi as committed, so a replayed old batch is still skipped after its
   * per-epoch manifest was GC'd.
   */
  def compact(spark: SparkSession, targetPartitions: Int = 8): Unit = {
    val f = fs()
    val epochs = committedEpochs()
    val prevHi = compactHi()
    if (epochs.isEmpty || (epochs.size < 2 && prevHi.isEmpty)) return
    val hi = epochs.max
    val dataPath = s"$tableDir/data/compact-$hi"
    // rewrite EXACTLY the captured epoch set — not read(), which re-lists
    // the manifest dir and would fold an epoch committed concurrently
    // (> hi) into the snapshot while its own manifest survives the GC
    // below, permanently duplicating its rows
    val srcPaths = prevHi.map(h => s"$tableDir/data/compact-$h").toSeq ++
      epochs.filter(e => prevHi.forall(e > _)).map(e => s"$tableDir/data/epoch=$e")
    spark.read.parquet(srcPaths: _*).coalesce(targetPartitions)
      .write.mode(SaveMode.Overwrite).parquet(dataPath)
    val tmp = new Path(manifestDir, s".compact-$hi.json.tmp")
    val body =
      s"""{"compact_hi": $hi, "n_epochs": ${epochs.size},
         | "data_path": "data/compact-$hi"}""".stripMargin
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val dest = new Path(manifestDir, f"compact-$hi%010d.json")
    if (!f.rename(tmp, dest)) { f.delete(tmp, false); return }
    hiCache = Some(hi)
    // GC superseded manifests (data dirs retained for in-flight readers)
    epochs.filter(_ <= hi).foreach(e => f.delete(epochManifest(e), false))
    prevHi.foreach(h => f.delete(new Path(manifestDir, f"compact-$h%010d.json"), false))
  }

  /**
   * Delete data directories no longer referenced by any manifest entry
   * (epoch dirs folded into a snapshot, superseded snapshots). Run this
   * once no reader can still hold a pre-compaction manifest listing —
   * the grace period is operational (e.g. max query runtime), which is
   * why GC is a separate explicit step and not part of [[compact]].
   * Returns the number of directories removed.
   */
  def gcUnreferenced(): Int = {
    val f = fs()
    val dataDir = new Path(tableDir, "data")
    if (!f.exists(dataDir)) return 0
    // capture the horizons FIRST: a directory with an id beyond them may
    // be an IN-FLIGHT write (parquet laid down, manifest not yet
    // published) — deleting it would let write()/compact() publish a
    // manifest pointing at deleted files. Anything at or below a captured
    // horizon that is still unreferenced is genuinely superseded.
    val epochs = committedEpochs()
    val maxEpoch = epochs.lastOption.getOrElse(compactHi().getOrElse(-1L))
    val hi = compactHi()
    val live: Set[String] =
      epochs.map(e => s"epoch=$e").toSet ++ hi.map(h => s"compact-$h").toSet
    def superseded(name: String): Boolean = name match {
      case s if s.startsWith("epoch=") =>
        s.stripPrefix("epoch=").toLongOption.exists(_ <= maxEpoch)
      case s if s.startsWith("compact-") =>
        s.stripPrefix("compact-").toLongOption.exists(c => hi.exists(c < _))
      case _ => false // unknown layout: never delete
    }
    val victims = f.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter(p => !live.contains(p.getName) && superseded(p.getName))
    victims.foreach(p => f.delete(p, true))
    victims.size
  }
}
