package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata alongside (builder brief "multimodal
  * columns"). The Spark-side shape is real — schema, per-partition
  * decoder lifecycle, batch iteration, typed output — while the codec
  * itself is STUBBED with a deterministic byte-derived fake (the
  * image/audio libraries are not in this container). Swapping in a real
  * decoder changes only the bodies marked `STUB DECODE`.
  *
  * Scale posture: `mapPartitions` initializes one decoder per partition
  * (codec init is expensive; per-row init would dominate), rows stream
  * through without materializing the partition, and the binary payload
  * never leaves the executor — only the small typed metadata shuffles.
  */
object MediaStub {

  /** A media asset row: opaque payload + container metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

  /** Decoded (here: fake-decoded) typed metadata. */
  final case class MediaMeta(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** One sampled frame reference (video frame-sampling output shape). */
  final case class FrameRef(doc_id: Long, frame_no: Int, byte_offset: Long)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Decode metadata for every asset. Batch shape: one decoder instance
    * per partition, streamed row-at-a-time. */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { rows =>
      // per-partition decoder lifecycle (real codecs are expensive to init)
      val md = MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        md.reset()
        val digest = hex(md.digest(r.media))
        // STUB DECODE: a real implementation hands r.media to the codec
        // and reads true dimensions/frame counts. The fake is a pure
        // function of the bytes, so tests and oracles can pin it.
        val n = r.media.length
        val b0 = if (n > 0) r.media(0) & 0xff else 0
        val b1 = if (n > 1) r.media(1) & 0xff else 0
        val width = 16 + (b0 * 256 + b1) % 4080
        val height = 16 + (b1 * 256 + b0) % 2144
        val frames = if (r.mime.startsWith("video/")) 1 + n % 240 else 1
        MediaMeta(r.doc_id, r.mime, n, digest, width, height, frames)
      }
    }
  }

  /** Frame sampling: every `everyN`-th frame of each video asset as a
    * (doc_id, frame_no, byte_offset) row — the downstream shape a frame
    * extractor would feed to a vision model. Non-video assets emit frame
    * 0 only. */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): Dataset[FrameRef] = {
    import meta.sparkSession.implicits._
    require(everyN > 0, "everyN must be positive")
    meta.flatMap { m =>
      val frames = 0 until m.n_frames by everyN
      // STUB DECODE: byte offsets are the fake fixed-stride layout; a real
      // demuxer would read the container index.
      val stride = if (m.n_frames > 0) math.max(1L, m.n_bytes.toLong / m.n_frames) else 1L
      frames.map(f => FrameRef(m.doc_id, f, f * stride))
    }
  }
}
