package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract /
 * frame-sample stages.
 *
 * Reference analog: `Frame.imageBytes` + lazily-decoded image cache
 * (`model/Frame.java:40,84-93`) and the codec ops
 * (`operation/VideoToFramesOp.java:90-129` decodes a binary chunk into
 * frames — the explode pattern below).
 *
 * The actual codec step is a STUB — media libraries are not available in
 * this environment — but it is a *deterministic* stub (metadata derived
 * from byte content), so the surrounding Spark machinery (schema, batch
 * shape, explode-per-frame, partition sizing) is real and testable. Swap
 * [[MediaStub.decode]] for a real decoder (JavaCV/ffmpeg) on a real
 * cluster; nothing else changes.
 */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(width: Int, height: Int, frames: Int, sampleRateHz: Int)
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class FrameRow(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  object MediaStub {
    /**
     * STUB decode: a real implementation would parse the container header.
     * This deterministic fake derives metadata from the payload bytes so
     * tests and oracles are exact. Marked clearly; replace me.
     */
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(
        width = n % 640 + 1,
        height = (n * 7) % 480 + 1,
        frames = n % 30 + 1,
        sampleRateHz = 16000)
    }

    /** STUB frame extraction: slice of payload per frame index. */
    def frame(payload: Array[Byte], idx: Int, frames: Int): Array[Byte] = {
      val n = payload.length
      if (n == 0) Array.emptyByteArray
      else {
        val start = (n.toLong * idx / frames).toInt
        val end = (n.toLong * (idx + 1) / frames).toInt
        java.util.Arrays.copyOfRange(payload, start, math.max(end, start))
      }
    }
  }

  /** Wrap a (id, binary) DataFrame into typed media records (stub decode). */
  def asMedia(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
      kind: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaRecord(id, kind, bytes, MediaStub.decode(bytes))
      })
  }

  /**
   * Frame sampling: one output row per `every`-th frame — the reference's
   * frame-skip predicate `frameNr % frameSkip == 0`
   * (`util/StreamReader.java:162`) as an explode. mapPartitions keeps the
   * decode state per-partition (a real codec would be opened once per
   * partition, not per row — same shape as executor-side lazy init,
   * SURVEY.md §2.9 OpenCVOp note).
   */
  def sampleFrames(media: Dataset[MediaRecord], every: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (real codec handle)
      it.flatMap { m =>
        Iterator.range(0, m.meta.frames)
          .filter(_ % every == 0)
          .map(i => FrameRow(m.media_id, i, MediaStub.frame(m.payload, i, m.meta.frames)))
      }
    }
  }

  final case class ResizedFrame(media_id: Long, frame_idx: Int,
      width: Int, height: Int, pixels: Array[Byte])
  final case class MediaFeatures(media_id: Long, frame_idx: Int, feature: Array[Float])

  /**
   * Frame resize to `w`×`h` — the reference's `ScaleImageOp`
   * (`operation/ScaleImageOp.java:55-78`). STUB resampler (nearest-byte
   * index map, deterministic); the Spark shape is the real part: a
   * stateless per-partition map whose output size is FIXED per row
   * (w·h bytes), which is what lets downstream stages size partitions —
   * resize early, before any shuffle, so exchanges carry the small
   * fixed-size frames rather than originals.
   */
  def resizeFrames(frames: Dataset[FrameRow], w: Int, h: Int): Dataset[ResizedFrame] = {
    import frames.sparkSession.implicits._
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"target dims must be positive with w*h <= Int.MaxValue; got ${w}x$h")
    frames.mapPartitions { it =>
      // per-partition scaler init would go here (real image lib handle)
      it.map { f =>
        val n = f.frame_bytes.length
        val out = new Array[Byte](w * h)
        if (n > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = f.frame_bytes((i.toLong * n / out.length).toInt)
            i += 1
          }
        }
        ResizedFrame(f.media_id, f.frame_idx, w, h, out)
      }
    }
  }

  /**
   * Per-frame feature extraction — the reference's `FeatureExtractionOp`
   * (`operation/FeatureExtractionOp.java:69-112`) shape: frame bytes →
   * fixed-length `array<float>` descriptor. STUB descriptor = L1-
   * normalized byte histogram over `bins` buckets, quantized to 1e-6 so
   * vectors are bit-identical at any partitioning and feed directly into
   * the [[Similarity]] kNN/ANN operators (the DRPC matcher pipeline,
   * end to end).
   */
  def extractFeatures(frames: Dataset[FrameRow], bins: Int = 16): Dataset[MediaFeatures] = {
    import frames.sparkSession.implicits._
    require(bins > 0 && 256 % bins == 0, "bins must divide 256")
    frames.mapPartitions { it =>
      it.map { f =>
        val counts = new Array[Long](bins)
        var i = 0
        while (i < f.frame_bytes.length) { // per-byte hot loop: no boxing
          counts((f.frame_bytes(i) & 0xff) * bins / 256) += 1
          i += 1
        }
        val total = math.max(1L, f.frame_bytes.length.toLong)
        val feat = counts.map(c =>
          (math.floor(c.toDouble / total * 1e6) / 1e6).toFloat)
        MediaFeatures(f.media_id, f.frame_idx, feat)
      }
    }
  }

  /**
   * Oracle-checked stats over the stubbed pipeline, driven by the
   * documents table (text bytes as the opaque payload): per source, the
   * number of sampled frames (every 10th) and total payload bytes.
   * Pure column expressions — the formula mirrors MediaStub.decode.
   */
  def frameSampleStats(docs: DataFrame): DataFrame = {
    val m = docs.select(col("source"),
      octet_length(col("text")).as("nbytes"),
      (octet_length(col("text")) % 30 + 1).as("frames"))
    m.select(col("source"), col("nbytes"),
        explode(sequence(lit(0), col("frames") - 1)).as("f"))
      .where(col("f") % 10 === 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_frames"), sum(col("nbytes")).as("sum_bytes"))
  }
}
