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

  /** Resize plan: aspect-preserving fit into `maxW`×`maxH`. The
    * geometry (the part a pipeline actually branches on) is REAL pure
    * math — never upscale, preserve aspect ratio, floor to pixels; only
    * the pixel resampling itself would be codec work. `scale_e4` is the
    * applied factor in fixed-point so downstream joins/filters are
    * engine-exact. */
  final case class ResizePlan(
      doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, scale_e4: Long)

  def planResize(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): Dataset[ResizePlan] = {
    import meta.sparkSession.implicits._
    require(maxW > 0 && maxH > 0)
    meta.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      ResizePlan(m.doc_id, m.width, m.height,
        math.max(1, math.floor(m.width * scale).toInt),
        math.max(1, math.floor(m.height * scale).toInt),
        math.floor(scale * 10000).toLong)
    }
  }

  /** Feature extraction: one `dim`-float vector per asset — the
    * embedding-shaped output a vision/audio encoder would produce, fed
    * to the sim_* ANN queries downstream. One "model" per partition
    * (mapPartitions), rows streamed. STUB DECODE: the vector is a
    * deterministic byte-derived fake (rolling sums over the payload);
    * a real encoder replaces only the vector body, not the plumbing. */
  def extractFeatures(records: Dataset[MediaRecord], dim: Int): Dataset[(Long, Array[Float])] = {
    import records.sparkSession.implicits._
    require(dim > 0)
    records.mapPartitions { rows =>
      // per-partition "model load" (a real encoder is expensive to init)
      val acc = new Array[Float](dim)
      rows.map { r =>
        java.util.Arrays.fill(acc, 0.0f)
        var i = 0
        while (i < r.media.length) {
          acc(i % dim) += ((r.media(i) & 0xff) - 128) / 128.0f
          i += 1
        }
        val n = math.max(1, r.media.length / dim)
        (r.doc_id, acc.map(_ / n).clone())
      }
    }
  }
}
