package graft.multimodal

/** REAL WAV (RIFF/WAVE) 16-bit PCM sample codec — the audio twin of
  * [[PngCodec]], closing the pixel/sample-decode caveat for the second
  * format that needs no codec library at all: PCM samples are just
  * little-endian int16s behind spec-exact RIFF chunk framing (Microsoft
  * multimedia spec / RFC 2361 WAVEFORMATEX). The decoder WALKS the
  * chunk list (`fmt ` then `data`, skipping unknown chunks like `LIST`
  * with the RIFF odd-length pad rule) rather than assuming the
  * canonical 44-byte layout, so files with metadata chunks decode too.
  * `mm_audio_stats` pins decoded per-file statistics against an
  * ARITHMETIC oracle: the fixture's samples are a formula of
  * (doc_id, i), so DuckDB predicts every sum, extreme, and
  * zero-crossing count without touching a WAV byte.
  *
  * Scale posture: identical to PngCodec — decode is per-row CPU work
  * inside mapPartitions, embarrassingly parallel, no shuffle; only the
  * small stats rows leave the executor. At 100 TB the same plan reads
  * the WAV bytes from a binary column instead of synthesizing them.
  *
  * Reference: the lakehouse treats media as opaque binary assets
  * (airflow/dags/utils/transformer.py asset handling); sample-level
  * decode is beyond-reference surface for the multimodal tier.
  */
object WavCodec {

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
  private def leU16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii4(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode interleaved PCM16 samples as a complete RIFF/WAVE file:
    * RIFF[WAVE] + fmt(16, PCM, channels, rate) + data(LE int16s).
    * `samples.length` must be a multiple of `channels`. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val blockAlign = channels * 2
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    val header =
      "RIFF".getBytes ++ le32(36 + dataLen) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(sampleRate) ++ le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
        "data".getBytes ++ le32(dataLen)
    System.arraycopy(header, 0, out, 0, 44)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(45 + 2 * i) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decoded PCM16 stream: interleaved samples + the fmt fields a
    * consumer needs to interpret them. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decode a RIFF/WAVE file to PCM16 samples by walking the chunk
    * list. Returns None for anything that is not well-formed 16-bit
    * integer PCM (wrong magic, truncated chunks, missing fmt/data,
    * compressed formats) — the quarantine contract MediaStub parsers
    * follow. Unknown chunks are skipped with the RIFF rule that
    * odd-length chunks are padded to an even boundary. */
  def decode(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 12 || ascii4(b, 0) != "RIFF" || ascii4(b, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var bitsOk = false
    var data: Option[(Int, Int)] = None // (offset, length)
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii4(b, pos)
      val len = leU32(b, pos + 4)
      if (len > Int.MaxValue || pos + 8 + len > b.length) return None // truncated chunk
      val body = pos + 8
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = leU16(b, body)
          val channels = leU16(b, body + 2)
          val rate = leU32(b, body + 4)
          val bits = leU16(b, body + 14)
          if (audioFormat != 1 || channels == 0 || rate > Int.MaxValue) return None
          bitsOk = bits == 16
          fmt = Some((channels, rate.toInt))
        case "data" => data = Some((body, len.toInt))
        case _      => // skip unknown chunk (LIST, fact, cue, ...)
      }
      pos = body + len.toInt + (len.toInt & 1) // RIFF even-boundary pad
    }
    for {
      (channels, rate) <- fmt
      if bitsOk
      (off, len) <- data
      if len % 2 == 0 && (len / 2) % channels == 0
    } yield {
      val n = len / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((b(off + 2 * i) & 0xff) | (b(off + 2 * i + 1) << 8)).toShort
        i += 1
      }
      Pcm(rate, channels, samples)
    }
  }
}
