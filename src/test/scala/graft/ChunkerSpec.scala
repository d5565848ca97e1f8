package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunker
import graft.chunk.Chunker.Config

/** F17-F20 chunker specs: golden cases pinned to the reference's
  * `transformer.py:689-893` semantics plus seeded randomized properties —
  * every chunk within max, min respected except the tail, exact coverage
  * when no boundary snapping applies. (Plain seeded loops, not
  * ScalaCheck forAll: the scalatest-scalacheck bridge isn't in the
  * offline artifact cache.)
  */
class ChunkerSpec extends AnyFunSuite {

  test("F17 normalize_pdf_text de-hyphenates and collapses whitespace") {
    assert(Chunker.normalizePdfText("algo-\nrithm") == "algorithm")
    assert(Chunker.normalizePdfText("a\r\nb") == "a\n\nb") // \r→\n, pairs survive (only 3+ collapse)
    assert(Chunker.normalizePdfText("a  \t b") == "a b")
    assert(Chunker.normalizePdfText("a\n\n\n\nb") == "a\n\nb")
    assert(Chunker.normalizePdfText("  x  ") == "x")
  }

  test("F18 sliding window splits on sentence boundaries in the tail window") {
    val cfg = Config(maxChars = 40, minChars = 10, overlapChars = 8)
    // ". " at index 34 sits inside the snap window [20, 38] of the first
    // 40-char slice, so the chunk must end exactly on the sentence.
    val text = "First sentence is long enough here. Second sentence follows right after."
    val chunks = Chunker.splitLongSegment(text, cfg)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= cfg.maxChars))
    assert(chunks.head == "First sentence is long enough here.")
  }

  test("F18 short text below max is a single chunk") {
    assert(Chunker.splitLongSegment("short", Config(100, 10, 20)) == Vector("short"))
    assert(Chunker.splitLongSegment("   ", Config(100, 10, 20)) == Vector.empty)
  }

  test("F18 property: every chunk ≤ maxChars and non-empty (200 random texts)") {
    val rng = new scala.util.Random(42)
    val alphabet = "abc XY12.\n"
    val cfg = Config(maxChars = 120, minChars = 30, overlapChars = 20)
    for (_ <- 1 to 200) {
      val n = rng.nextInt(2000)
      val s = Array.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
      val chunks = Chunker.splitLongSegment(s, cfg)
      assert(chunks.forall(c => c.nonEmpty && c.length <= cfg.maxChars),
        s"bad chunk for len=$n")
    }
  }

  test("F18 property: zero overlap + no boundary chars ⇒ exact coverage") {
    val rng = new scala.util.Random(7)
    val cfg = Config(maxChars = 100, minChars = 0, overlapChars = 0)
    for (_ <- 1 to 200) {
      val n = 1 + rng.nextInt(1500)
      val s = Array.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
      val chunks = Chunker.splitLongSegment(s, cfg)
      assert(chunks.mkString("") == s, s"coverage broken for len=$n")
    }
  }

  test("F18 property: overlap never exceeds maxChars/2") {
    // cfg asks for an overlap above max/2; implementation must clamp
    val cfg = Config(maxChars = 100, minChars = 0, overlapChars = 90)
    val s = Array.fill(1000)('a').mkString
    val chunks = Chunker.splitLongSegment(s, cfg)
    // clamped overlap=50 ⇒ step=50 ⇒ 19 windows of ≤100 over 1000 chars
    assert(chunks.forall(_.length <= 100))
    assert(chunks.size == (1000 - 50 + 49) / 50)
  }

  test("F19 paragraph packing joins small paragraphs, spills long ones") {
    val cfg = Config(maxChars = 50, minChars = 5, overlapChars = 5)
    val text = "para one\n\npara two\n\n" + ("x" * 120) + "\n\npara three"
    val chunks = Chunker.chunkTextSmart(text, cfg)
    assert(chunks.forall(_.length <= cfg.maxChars))
    assert(chunks.head == "para one\n\npara two")
    assert(chunks.last == "para three")
    // the 120-char paragraph spilled into ≥2 window chunks
    assert(chunks.count(_.forall(_ == 'x')) >= 2)
  }

  test("F20 chunk_document_record status taxonomy and ids") {
    val (rows, status) = Chunker.chunkDocumentRecord(
      "res1", "asset1", "English", Seq(1 -> "Hello world. More text here."))
    assert(status == "ok")
    assert(rows.nonEmpty)
    assert(rows.head.lang == "en")
    assert(rows.head.chunk_tier == 3)
    assert(rows.head.chunk_id.length == 64) // sha256 hex
    assert(rows.head.token_count == 5)

    assert(Chunker.chunkDocumentRecord("", "a", "en", Seq(1 -> "x"))._2 == "missing_keys")
    assert(Chunker.chunkDocumentRecord("r", "a", "en", Seq(1 -> "   "))._2 == "empty_pdf_text")
  }

  test("F20 chunk ids are deterministic and distinct per page/order") {
    val pages = Seq(1 -> ("A " * 300), 2 -> ("B " * 300))
    val (rows1, _) = Chunker.chunkDocumentRecord("r", "a", "en", pages)
    val (rows2, _) = Chunker.chunkDocumentRecord("r", "a", "en", pages)
    assert(rows1.map(_.chunk_id) == rows2.map(_.chunk_id))
    assert(rows1.map(_.chunk_id).distinct.size == rows1.size)
  }
}
