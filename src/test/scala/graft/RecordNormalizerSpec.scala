package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RecordNormalizer, SubjectMatcher}
import graft.functions.RecordNormalizer.RawRecord
import graft.functions.SubjectMatcher.Subject

/** F15 — whole-record normalizer spec: the bronze→silver derivation
  * chain (F1-F14 composed) with an injected clock, checked field by
  * field including the fingerprint's stability.
  */
class RecordNormalizerSpec extends AnyFunSuite {

  private val matcher = new SubjectMatcher(Seq(
    Subject(1, Some("Học máy"), Some("Machine Learning"), Some("CS401")),
    Subject(2, Some("Cơ sở dữ liệu"), Some("Database Systems"), Some("CS302"))))
  private val programs = Map(1 -> Seq(10, 11), 2 -> Seq(20))
  private val now = LocalDateTime.of(2026, 8, 12, 0, 0)

  private val row = RawRecord(
    fields = Map(
      "id" -> "6006",
      "url" -> "https://ocw.mit.edu/courses/6006",
      "title" -> "Introduction to Machine Learning",
      "description" -> ("A complete course on machine learning fundamentals, " +
        "models, optimization and evaluation for practitioners."),
      "language" -> "English",
      "license_name" -> "https://creativecommons.org/licenses/by/4.0/",
      "publication_date" -> "2023",
      "scraped_at" -> "2026-01-02T03:04:05Z",
      "publisher" -> "  "),
    lists = Map(
      "instructors" -> Seq(" Alice ", "Bob", "Alice"),
      "pdf_paths" -> Seq("b.pdf", "a.pdf", "b.pdf")))

  test("normalizes the full record") {
    val out = RecordNormalizer.normalize(row, matcher, programs, now).get
    assert(out.sourceSystem == "mit_ocw") // derived from the URL domain
    assert(out.resourceId == "mit_ocw_6006")
    assert(out.resourceUid.length == 64)
    assert(out.title == Some("Introduction to Machine Learning"))
    assert(out.creatorNames == Seq("Alice", "Bob")) // cleaned, deduped
    assert(out.publisherName == "MIT OpenCourseWare") // blank publisher → source map
    assert(out.language == "en")
    assert(out.licenseName == Some("License")) // URL-as-name swap
    assert(out.licenseUrl == Some("https://creativecommons.org/licenses/by/4.0/"))
    assert(out.publicationYear == Some(2023)) // year-only parse
    assert(out.scrapedAt == Some(LocalDateTime.of(2026, 1, 2, 3, 4, 5)))
    assert(out.lastUpdatedAt == out.scrapedAt) // fallback chain
    assert(out.pdfPaths == Seq("b.pdf", "a.pdf"))
    assert(out.pdfCountDeclared == 2 && out.hasAssets)
    assert(out.matchedSubjects.map(_.subjectId) == Seq(1)) // name_en substring
    assert(out.programIds == Seq(10, 11))
    assert(out.dataQualityScore == 1.0) // every weight present
    assert(out.ingestedAt == now)
  }

  test("fingerprint is stable and input-order independent") {
    val a = RecordNormalizer.normalize(row, matcher, programs, now).get
    val reordered = row.copy(lists = row.lists.updated("pdf_paths", Seq("a.pdf", "b.pdf")))
    val b = RecordNormalizer.normalize(reordered, matcher, programs, now).get
    // pdf list is sorted inside the canonical payload
    assert(a.recordFingerprint == b.recordFingerprint)
    val changed = row.copy(fields = row.fields.updated("title", "Different"))
    val c = RecordNormalizer.normalize(changed, matcher, programs, now).get
    assert(a.recordFingerprint != c.recordFingerprint)
  }

  test("record without any identifier is dropped") {
    assert(RecordNormalizer.normalize(RawRecord(), matcher, programs, now).isEmpty)
    // title-only record falls back to the slug identifier
    val slugged = RecordNormalizer.normalize(
      RawRecord(fields = Map("title" -> "Intro to AI!", "source" -> "openstax")),
      matcher, programs, now).get
    assert(slugged.resourceId == "openstax_intro_to_ai")
    assert(slugged.publisherName == "OpenStax")
    assert(!slugged.hasAssets && slugged.dataQualityScore < 1.0)
  }
}
