package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, WavCodec}

/** Pins the real WAV PCM16 codec: byte-faithful encode→decode round
  * trips, chunk-walking past metadata chunks with the RIFF odd-length
  * pad rule, and honest None on foreign/compressed/truncated bytes.
  */
class WavCodecSpec extends AnyFunSuite {

  private def randomSamples(rnd: scala.util.Random, n: Int): Array[Short] =
    Array.fill(n)(rnd.nextInt(65536).toShort)

  test("encode/decode round-trips samples exactly across shapes") {
    val rnd = new scala.util.Random(11)
    for ((rate, ch, frames) <- Seq((8000, 1, 1), (8000, 1, 77), (44100, 2, 64), (16000, 3, 33))) {
      val samples = randomSamples(rnd, frames * ch)
      val wav = WavCodec.encode(rate, ch, samples)
      val Some(pcm) = WavCodec.decode(wav)
      assert(pcm.sampleRate == rate && pcm.channels == ch)
      assert(pcm.samples.sameElements(samples), s"round trip broke at $rate/$ch/$frames")
    }
  }

  test("extreme int16 values survive the little-endian round trip") {
    val samples = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 255, 256, -256)
    val Some(pcm) = WavCodec.decode(WavCodec.encode(8000, 1, samples))
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("decoder walks past unknown chunks, including the odd-length pad rule") {
    val samples = Array[Short](5, -7, 900, -32768)
    val canonical = WavCodec.encode(8000, 1, samples)
    // splice a LIST chunk (odd body length 5 -> padded to 6) between fmt and data
    val listChunk = "LIST".getBytes ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes ++ Array[Byte](0)
    val spliced = canonical.slice(0, 36) ++ listChunk ++ canonical.slice(36, canonical.length)
    // patch the RIFF size field (bytes 4..7, LE) for the inserted chunk
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte
    spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val Some(pcm) = WavCodec.decode(spliced)
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("foreign, compressed, and truncated bytes decode to None") {
    assert(WavCodec.decode("not a wav at all".getBytes).isEmpty)
    assert(WavCodec.decode(MediaFixtures.png(4, 4, new Array[Byte](8))).isEmpty)
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2, 3, 4))
    assert(WavCodec.decode(good.slice(0, good.length - 3)).isEmpty, "truncated data chunk")
    // audioFormat = 2 (ADPCM) is not PCM -> None
    val adpcm = good.clone(); adpcm(20) = 2
    assert(WavCodec.decode(adpcm).isEmpty)
    // 8-bit PCM is not the 16-bit contract -> None
    val pcm8 = good.clone(); pcm8(34) = 8
    assert(WavCodec.decode(pcm8).isEmpty)
  }

  test("zeroed MediaFixtures.wav (the mm_binary_meta fixture) decodes as silence") {
    val Some(pcm) = WavCodec.decode(MediaFixtures.wav(44100, 2, 10))
    assert(pcm.sampleRate == 44100 && pcm.channels == 2)
    assert(pcm.samples.length == 20 && pcm.samples.forall(_ == 0))
  }
}
