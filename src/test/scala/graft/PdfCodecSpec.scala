package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.PdfCodec
import graft.multimodal.PdfCodec.OutlineNode

/** The minimal PDF byte layer: spec-exact write → real xref/object/
  * stream/outline parse round-trips, escapes and UTF-16 titles
  * survive, the outline tree flattens in PyPDF2 order with resolved
  * destination pages, and non-PDF / truncated / unsupported bytes
  * degrade to None instead of throwing.
  */
class PdfCodecSpec extends AnyFunSuite {

  test("page texts round-trip through Flate-compressed content streams") {
    val pages = Seq("hello world", "second page with (parens) and \\backslash",
      "third\tpage")
    val doc = PdfCodec.decode(PdfCodec.encode(pages))
      .getOrElse(fail("decode returned None"))
    assert(doc.totalPages == 3)
    assert(doc.pages == pages.toVector)
    assert(doc.outline.isEmpty)
  }

  test("outline tree flattens depth-first with levels and resolved pages") {
    val outline = Seq(
      OutlineNode("Chapter 1", 1, Seq(
        OutlineNode("Section 1.1", 1), OutlineNode("Section 1.2", 2))),
      OutlineNode("Chapter 2", 3, Seq(OutlineNode("Section 2.1", 4))),
      OutlineNode("Chapter 3", 5))
    val doc = PdfCodec.decode(
      PdfCodec.encode((1 to 5).map(i => s"page $i"), outline))
      .getOrElse(fail("decode returned None"))
    assert(doc.outline == Vector(
      (0, "Chapter 1", Some(1)), (1, "Section 1.1", Some(1)),
      (1, "Section 1.2", Some(2)), (0, "Chapter 2", Some(3)),
      (1, "Section 2.1", Some(4)), (0, "Chapter 3", Some(5))))
  }

  test("non-Latin-1 titles and page text survive via UTF-16BE text strings") {
    val pages = Seq("tiếng Việt — chương một", "ascii page")
    val outline = Seq(OutlineNode("Chương 1 – Mở đầu", 1))
    val doc = PdfCodec.decode(PdfCodec.encode(pages, outline))
      .getOrElse(fail("decode returned None"))
    assert(doc.pages == pages.toVector)
    assert(doc.outline == Vector((0, "Chương 1 – Mở đầu", Some(1))))
  }

  test("the emitted xref is byte-offset exact (decode after re-locating every object)") {
    // any off-by-one in an offset makes some object unparsable; a
    // 40-page doc with a deep outline exercises many offsets
    val pages = (1 to 40).map(i => s"content of page $i " * 5)
    val outline = (1 to 10).map(c => OutlineNode(s"Chapter $c", 4 * c - 3,
      (0 to 2).map(s => OutlineNode(s"Sec $c.$s", 4 * c - 3 + s))))
    val doc = PdfCodec.decode(PdfCodec.encode(pages, outline))
      .getOrElse(fail("decode returned None"))
    assert(doc.totalPages == 40)
    assert(doc.pages == pages.toVector)
    assert(doc.outline.size == 40)
    assert(doc.outline.count(_._1 == 0) == 10)
  }

  test("garbage, truncation, and foreign formats degrade to None") {
    assert(PdfCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PdfCodec.decode("not a pdf at all".getBytes("UTF-8")).isEmpty)
    val good = PdfCodec.encode(Seq("page"))
    assert(PdfCodec.decode(good.take(good.length / 2)).isEmpty)
    // a PNG is not a PDF
    assert(PdfCodec.decode(
      graft.multimodal.PngCodec.encode(2, 2, new Array[Byte](12))).isEmpty)
  }
}
