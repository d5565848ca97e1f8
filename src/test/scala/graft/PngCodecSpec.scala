package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, PngCodec}

/** Pins the real PNG codec: byte-exact encode→decode round trips
  * (cycling filters covers all five reconstruction functions), spec
  * agreement with the Paeth reference implementation, and honest
  * None on foreign/corrupt bytes.
  */
class PngCodecSpec extends AnyFunSuite {

  private def randomRgb(rnd: scala.util.Random, w: Int, h: Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3); rnd.nextBytes(a); a
  }

  test("encode/decode round-trips byte-exactly across shapes (all five filters exercised)") {
    val rnd = new scala.util.Random(7)
    // heights >= 5 guarantee every filter type 0..4 appears
    for ((w, h) <- Seq((1, 1), (1, 7), (5, 5), (16, 6), (3, 11), (40, 9))) {
      val rgb = randomRgb(rnd, w, h)
      val png = PngCodec.encode(w, h, rgb)
      val Some((dw, dh, out)) = PngCodec.decodePixels(png)
      assert((dw, dh) == (w, h))
      assert(out.sameElements(rgb), s"round trip broke at ${w}x$h")
    }
  }

  test("paeth predictor matches the spec reference on exhaustive small values") {
    // reference: nearest of a,b,c to p=a+b-c with a<=b<=c tie order
    def ref(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (a <- 0 to 255 by 17; b <- 0 to 255 by 13; c <- 0 to 255 by 19)
      assert(PngCodec.paeth(a, b, c) == ref(a, b, c))
  }

  test("gradient image: decoded stats equal direct arithmetic") {
    val (w, h) = (13, 9)
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = ((x * 3 + y * 5) % 256).toByte
      rgb(i + 1) = ((x + y) % 256).toByte
      rgb(i + 2) = ((x * 7) % 256).toByte
    }
    val Some((_, _, out)) = PngCodec.decodePixels(PngCodec.encode(w, h, rgb))
    val sums = out.grouped(3).foldLeft((0L, 0L, 0L)) { case ((r, g, b), px) =>
      (r + (px(0) & 0xff), g + (px(1) & 0xff), b + (px(2) & 0xff))
    }
    val expected = (0 until h).flatMap(y => (0 until w).map(x =>
      ((x * 3 + y * 5) % 256, (x + y) % 256, (x * 7) % 256)))
      .foldLeft((0L, 0L, 0L)) { case ((r, g, b), (er, eg, eb)) => (r + er, g + eg, b + eb) }
    assert(sums == expected)
  }

  test("foreign, truncated, and unsupported bytes decode to None (never throw)") {
    assert(PngCodec.decodePixels("not a png at all".getBytes).isEmpty)
    assert(PngCodec.decodePixels(Array.emptyByteArray).isEmpty)
    val good = PngCodec.encode(8, 8, new Array[Byte](8 * 8 * 3))
    assert(PngCodec.decodePixels(good.take(good.length - 20)).isEmpty)
    // MediaFixtures.png carries a NON-zlib payload after the header —
    // a metadata-only fixture must not decode to pixels
    assert(PngCodec.decodePixels(MediaFixtures.png(4, 4, Array[Byte](1, 2, 3))).isEmpty)
    // corrupt one IDAT byte: inflate fails or scanlines shorten → None
    val corrupt = good.clone
    corrupt(good.length - 30) = (corrupt(good.length - 30) ^ 0x55).toByte
    assert(PngCodec.decodePixels(corrupt).isEmpty ||
      PngCodec.decodePixels(corrupt).get._3.length == 8 * 8 * 3)
  }
}
