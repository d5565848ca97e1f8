package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, MediaStub}

/** MJPEG-in-MP4: the demux walk recovers byte ranges that decode to
  * the SAME pixels as decoding the pre-mux frames directly, frames
  * vary by frame_no (a transposed chunk table cannot pass), and the
  * stsz sizes are the real encoded frame sizes.
  */
class MjpegSpec extends AnyFunSuite {

  private def pixels(bytes: Array[Byte], off: Int, len: Int): Vector[Int] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, off, len))
    assert(img != null, "ImageIO refused the JPEG slice")
    (0 until img.getHeight).flatMap(y =>
      (0 until img.getWidth).map(x => img.getRGB(x, y))).toVector
  }

  test("demuxed sample slices decode pixel-identical to the source frames") {
    val w = 9; val h = 7
    val frames = (0 until 5).map(f =>
      graft.queries.MultimodalQueries.encodeJpeg(1234L * 31 + f, w, h))
    val bytes = MediaFixtures.mp4Frames(w, h, frames, samplesPerChunk = 3)
    val samples = MediaStub.mp4Samples(bytes)
    assert(samples.length == 5)
    assert(samples.map(_.n_bytes) == frames.map(_.length),
      "stsz sizes must be the real encoded frame sizes")
    samples.zip(frames).foreach { case (sm, frame) =>
      assert(pixels(bytes, sm.byte_offset.toInt, sm.n_bytes) ==
        pixels(frame, 0, frame.length),
        s"frame ${sm.frame_no} pixels drifted through the demux")
    }
    // per-frame seeds produce distinct images — order sensitivity is real
    val distinct = samples.map(sm => pixels(bytes, sm.byte_offset.toInt, sm.n_bytes))
    assert(distinct.distinct.length == distinct.length, "frames must differ")
  }
}
