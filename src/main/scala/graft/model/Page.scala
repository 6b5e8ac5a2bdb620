package graft.model

import java.sql.Timestamp

/**
 * Core data model of the engine — the Spark transposition of StormCV's
 * `CVParticle`/`Frame` tuple family (reference:
 * `stormcv/src/main/java/nl/tno/stormcv/model/CVParticle.java:24-30`,
 * `model/Frame.java:31-43`). Mapping (SURVEY.md §1):
 *
 *   - `streamId`   → `host` (derived from `url`) — the per-stream key
 *   - `sequenceNr` → `warc_ts` event time (plus per-host row_number when a
 *                    dense sequence is needed)
 *   - `imageBytes` → `html: Array[Byte]` raw page bytes
 *   - decoded image→ `text: String` (deterministic extraction output)
 *   - `metadata`   → typed columns; open-schema map dropped in favor of
 *                    Catalyst-friendly fixed schema
 *
 * All types are case classes ⇒ Spark product `Encoder`s replace the
 * reference's hand-written Kryo serializers (the `model/serializer`
 * package, ≈550 LoC — SURVEY.md §1.2).
 */
case class PageEvent(
    url: String,
    host: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Raw ingest row before extraction (text/lang not yet populated). */
case class RawPage(
    url: String,
    host: String,
    warc_ts: Timestamp,
    html: Array[Byte])

/**
 * Per-host metadata stream — the second fan-in branch of the north rule's
 * stream-stream join (reference analog: the Feature branch joined on
 * `(streamId, sequenceNr)` via `SequenceNrBatcher` + `FeatureCombinerOp`,
 * `E3_MultipleFeaturesTopology.java:75-77`).
 */
case class HostMeta(
    host: String,
    meta_ts: Timestamp,
    rank: Double,
    category: String)

/** Output row of the sessionizer (SURVEY.md §7.1 module 4). */
case class HostSession(
    host: String,
    session_start: Timestamp,
    session_end: Timestamp,
    n_pages: Long,
    text_bytes: Long)

/** Microsecond-exact Timestamp conversions (getTime alone drops micros). */
object TsUtil {
  def toUs(t: Timestamp): Long =
    (t.getTime - t.getNanos / 1000000L) * 1000L + t.getNanos / 1000L
  def fromUs(us: Long): Timestamp = {
    // floorDiv/floorMod: for pre-1970 (negative) micros, `/` truncates
    // toward zero and `%` goes negative, which setNanos rejects
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }
}

object PageEvent {
  /** Deterministic host extraction from a `https://host/path` url. */
  def hostOf(url: String): String = {
    val i = url.indexOf("://")
    val start = if (i < 0) 0 else i + 3
    val end0 = url.indexOf('/', start)
    val end = if (end0 < 0) url.length else end0
    url.substring(start, end)
  }
}
