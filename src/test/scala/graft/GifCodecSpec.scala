package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.GifCodec

/** Pins the real GIF LZW codec: byte-exact encode→decode round trips
  * (including dictionary overflow past 4096 codes and the KwKwK case),
  * cross-validation against the JDK's own ImageIO GIF reader (an
  * independent spec implementation), and honest None on foreign bytes.
  */
class GifCodecSpec extends AnyFunSuite {

  private def flatPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte
      p(3 * i + 1) = ((i * 7) % 256).toByte
      p(3 * i + 2) = ((255 - i) % 256).toByte
      i += 1
    }
    p
  }

  test("encode/decode round-trips byte-exactly across shapes") {
    val rnd = new scala.util.Random(11)
    for ((w, h) <- Seq((1, 1), (1, 9), (7, 7), (16, 5), (3, 13), (33, 8))) {
      val idx = new Array[Byte](w * h); rnd.nextBytes(idx)
      val gif = GifCodec.encode(w, h, idx, flatPalette)
      val Some((dw, dh, pal, out)) = GifCodec.decode(gif)
      assert((dw, dh) == (w, h))
      assert(pal.sameElements(flatPalette))
      assert(out.sameElements(idx), s"round trip broke at ${w}x$h")
    }
  }

  test("dictionary overflow (> 4096 codes) forces a mid-stream CLEAR and still round-trips") {
    val rnd = new scala.util.Random(23)
    val (w, h) = (200, 120) // 24k random symbols — dictionary fills and resets
    val idx = new Array[Byte](w * h); rnd.nextBytes(idx)
    val gif = GifCodec.encode(w, h, idx, flatPalette)
    val Some((dw, dh, _, out)) = GifCodec.decode(gif)
    assert((dw, dh) == (w, h))
    assert(out.sameElements(idx), "round trip broke across the dictionary reset")
  }

  test("KwKwK case (code == next free slot): constant and aaab-style runs round-trip") {
    for (fill <- Seq(0, 7, 255); n <- Seq(2, 3, 50, 1000)) {
      val idx = Array.fill(n)(fill.toByte)
      val gif = GifCodec.encode(n, 1, idx, flatPalette)
      val Some((_, _, _, out)) = GifCodec.decode(gif)
      assert(out.sameElements(idx), s"constant run n=$n fill=$fill broke")
    }
    val aaab = Array[Byte](1, 1, 1, 2, 1, 1, 1, 1, 2, 2, 1, 1)
    val gif = GifCodec.encode(aaab.length, 1, aaab, flatPalette)
    assert(GifCodec.decode(gif).get._4.sameElements(aaab))
  }

  test("JDK ImageIO (independent GIF implementation) reads our bytes to the same pixels") {
    val rnd = new scala.util.Random(31)
    for ((w, h) <- Seq((9, 6), (17, 11), (64, 48))) {
      val idx = new Array[Byte](w * h); rnd.nextBytes(idx)
      val pal = flatPalette
      val gif = GifCodec.encode(w, h, idx, pal)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null, "ImageIO rejected our GIF container")
      assert(img.getWidth == w && img.getHeight == h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = idx(y * w + x) & 0xff
          val want = 0xff000000 | ((pal(3 * v) & 0xff) << 16) |
            ((pal(3 * v + 1) & 0xff) << 8) | (pal(3 * v + 2) & 0xff)
          assert(img.getRGB(x, y) == want,
            f"pixel ($x,$y) idx=$v: ImageIO ${img.getRGB(x, y)}%08x != palette $want%08x")
          x += 1
        }
        y += 1
      }
    }
  }

  test("query fixture GIFs decode and honest None on foreign bytes") {
    for (id <- Seq(0L, 1L, 13L, 144L, 499L)) {
      val bytes = graft.queries.MultimodalQueries.fixtureGif(id)
      val Some((w, h, _, idx)) = GifCodec.decode(bytes)
      assert(idx.length == w * h)
      // spot-check one pixel against the fixture formula
      assert((idx(0) & 0xff) == ((id * 5) % 256).toInt)
    }
    assert(GifCodec.decode("not a gif at all".getBytes).isEmpty)
    assert(GifCodec.decode(Array[Byte]()).isEmpty)
  }
}
