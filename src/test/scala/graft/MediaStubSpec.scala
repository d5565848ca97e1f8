package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaStub
import graft.multimodal.MediaStub.{MediaMeta, MediaRecord}

/** Multimodal plumbing spec: binary columns survive the typed round-trip,
  * the per-partition decode emits deterministic metadata whose digest
  * matches the native sha2 expression, and frame sampling has the right
  * cardinality/offsets.
  */
class MediaStubSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def rec(id: Long, s: String, mime: String) =
    MediaRecord(id, s.getBytes(StandardCharsets.UTF_8), mime)

  test("decodeMeta digest matches the native sha2 expression") {
    import spark.implicits._
    val ds = Seq(rec(1, "hello world", "image/png"), rec(2, "", "audio/wav")).toDS()
    val meta = MediaStub.decodeMeta(ds).collect().sortBy(_.doc_id)
    val nativeSha = ds.toDF()
      .select(col("doc_id"), sha2(col("media"), 256).as("sha"))
      .as[(Long, String)].collect().toMap
    assert(meta.map(m => m.doc_id -> m.digest).toMap == nativeSha)
    assert(meta(0).n_bytes == 11)
    assert(meta(1).n_bytes == 0)
  }

  test("fake decode is deterministic and bounded") {
    import spark.implicits._
    val ds = Seq(rec(1, "abc", "image/png"), rec(2, "abc", "image/png")).toDS()
    val meta = MediaStub.decodeMeta(ds).collect()
    assert(meta.map(_.width).distinct.size == 1) // same bytes ⇒ same fake dims
    assert(meta.forall(m => m.width >= 16 && m.width < 4096))
    assert(meta.forall(m => m.height >= 16 && m.height < 2160))
    assert(meta.forall(_.n_frames == 1)) // images: single frame
  }

  test("video assets get frame counts and sampled frame refs") {
    import spark.implicits._
    val ds = Seq(rec(7, "x" * 1000, "video/mp4")).toDS()
    val meta = MediaStub.decodeMeta(ds)
    val m = meta.head()
    assert(m.n_frames == 1 + 1000 % 240)
    val frames = MediaStub.sampleFrames(meta, everyN = 10).collect().sortBy(_.frame_no)
    assert(frames.length == (m.n_frames + 9) / 10)
    assert(frames.head.frame_no == 0 && frames.head.byte_offset == 0L)
    // offsets follow the fixed stride layout
    val stride = math.max(1L, 1000L / m.n_frames)
    assert(frames.forall(f => f.byte_offset == f.frame_no * stride))
  }

  test("binary column round-trips through a DataFrame unscathed") {
    import spark.implicits._
    val payload = Array[Byte](0, 1, -1, 127, -128, 60)
    val ds = Seq(MediaRecord(9, payload, "application/octet-stream")).toDS()
    val back = ds.toDF().as[MediaRecord].head()
    assert(back.media.toSeq == payload.toSeq)
  }

  test("resize plan preserves aspect ratio and never upscales") {
    import spark.implicits._
    val meta = Seq(
      MediaMeta(1, "image/png", 10, "d", 4000, 2000, 1),  // downscale, wide
      MediaMeta(2, "image/png", 10, "d", 100, 50, 1),     // already fits
      MediaMeta(3, "image/png", 10, "d", 50, 2000, 1))    // downscale, tall
      .toDS()
    val plans = MediaStub.planResize(meta, 512, 512).collect().sortBy(_.doc_id)
    val p1 = plans(0)
    assert(p1.out_width == 512 && p1.out_height == 256) // aspect 2:1 kept
    assert(plans(1).out_width == 100 && plans(1).out_height == 50) // no upscale
    assert(plans(1).scale_e4 == 10000L)
    val p3 = plans(2)
    assert(p3.out_height == 512 && p3.out_width == math.floor(50 * 512.0 / 2000).toInt)
  }

  test("feature extraction: deterministic dim-sized vectors, payload-sensitive") {
    import spark.implicits._
    val ds = Seq(rec(1, "abcabc", "image/png"), rec(2, "abcabc", "image/png"),
      rec(3, "zzzzzz", "image/png")).toDS()
    val feats = MediaStub.extractFeatures(ds, dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    assert(feats.values.forall(_.size == 8))
    assert(feats(1L) == feats(2L))      // same bytes ⇒ same vector
    assert(feats(1L) != feats(3L))      // different bytes ⇒ different vector
    // partition count does not change vectors (model-per-partition)
    val reparts = MediaStub.extractFeatures(ds.repartition(3), dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    assert(reparts == feats)
  }

  test("partition count does not change results (decoder-per-partition)") {
    import spark.implicits._
    val recs = (1L to 50L).map(i => rec(i, s"payload-$i", if (i % 2 == 0) "video/mp4" else "image/png"))
    def run(parts: Int): Seq[MediaMeta] =
      MediaStub.decodeMeta(recs.toDS().repartition(parts)).collect().sortBy(_.doc_id).toSeq
    assert(run(1) == run(8))
  }
}
