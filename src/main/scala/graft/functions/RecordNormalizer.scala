package graft.functions

import java.time.LocalDateTime

import graft.functions.TextFunctions._

/** F15 — whole-record normalizer (semantics of
  * `airflow/src/silver/transformer.py:479-567`): one bronze record map →
  * one silver resource row, driving F1-F14: source-system derivation,
  * identifier/title probes, creator/pdf list cleaning, license swap,
  * datetime parsing, subject matching (top-5), program-id resolution,
  * quality score and the canonical record fingerprint.
  *
  * The ingestion timestamp is injected (`now`) — the reference sprinkles
  * `datetime.utcnow()` (SURVEY §7.3 "hard parts"); a supplied clock keeps
  * rows replayable and fingerprint-stable.
  */
object RecordNormalizer {

  final case class SilverResource(
      resourceUid: String,
      resourceId: String,
      sourceSystem: String,
      sourceUrl: Option[String],
      title: Option[String],
      description: Option[String],
      creatorNames: Seq[String],
      publisherName: String,
      language: String,
      licenseName: Option[String],
      licenseUrl: Option[String],
      publicationDate: Option[LocalDateTime],
      publicationYear: Option[Int],
      scrapedAt: Option[LocalDateTime],
      lastUpdatedAt: Option[LocalDateTime],
      bronzeSourcePath: Option[String],
      pdfPaths: Seq[String],
      pdfCountDeclared: Int,
      hasAssets: Boolean,
      matchedSubjects: Seq[SubjectMatcher.SubjectMatch],
      programIds: Seq[Int],
      recordFingerprint: String,
      dataQualityScore: Double,
      ingestedAt: LocalDateTime)

  /** A bronze record: string fields plus string-list fields (the two
    * shapes the reference's dicts actually carry). */
  final case class RawRecord(
      fields: Map[String, String] = Map.empty,
      lists: Map[String, Seq[String]] = Map.empty)

  def normalize(
      row: RawRecord,
      matcher: SubjectMatcher,
      programsBySubject: Map[Int, Seq[Int]],
      now: LocalDateTime): Option[SilverResource] = {

    def f(key: String): Option[String] = row.fields.get(key).flatMap(cleanScalar(_))

    val sourceSystem = deriveSourceSystem(row.fields)
    val resourceIdOpt = selectIdentifier(row.fields, sourceSystem)
    resourceIdOpt.map { resourceId =>
      val title = selectTitle(row.fields)
      val description = f("description")
      val sourceUrl = f("url").orElse(f("link"))
      val creators = cleanStringList(
        row.lists.getOrElse("instructors",
          row.lists.getOrElse("authors", row.lists.getOrElse("creators", Seq.empty))))
      val publisherName = derivePublisher(f("publisher").orElse(f("publisher_name")), sourceSystem)
      val language = ensureLanguageCode(row.fields.getOrElse("language", null))
      val (licenseName, licenseUrl) = deriveLicense(f("license_name").orElse(f("license")), f("license_url"))
      val publicationDate = f("publication_date").orElse(f("year"))
        .flatMap(parseDatetimeString)
      val scrapedAt = f("scraped_at").flatMap(parseDatetimeString)
      val lastUpdatedAt = f("last_updated_at").orElse(f("updated_at")).orElse(f("scraped_at"))
        .flatMap(parseDatetimeString)
      val pdfPaths = cleanStringList(row.lists.getOrElse("pdf_paths", Seq.empty))

      val matched = matcher.matchSubjects(title, description, topK = 5)
      val programIds = matched
        .flatMap(m => programsBySubject.getOrElse(m.subjectId, Seq.empty))
        .distinct.sorted

      SilverResource(
        resourceUid = deterministicHash(resourceId),
        resourceId = resourceId,
        sourceSystem = sourceSystem,
        sourceUrl = sourceUrl,
        title = title,
        description = description,
        creatorNames = creators,
        publisherName = publisherName,
        language = language,
        licenseName = licenseName,
        licenseUrl = licenseUrl,
        publicationDate = publicationDate,
        publicationYear = publicationDate.map(_.getYear),
        scrapedAt = scrapedAt,
        lastUpdatedAt = lastUpdatedAt,
        bronzeSourcePath = f("bronze_source_path"),
        pdfPaths = pdfPaths,
        pdfCountDeclared = pdfPaths.size,
        hasAssets = pdfPaths.nonEmpty,
        matchedSubjects = matched,
        programIds = programIds,
        recordFingerprint = computeRecordFingerprint(
          resourceId, sourceSystem, sourceUrl, title, description, creators,
          Some(publisherName), Some(language), licenseName, licenseUrl, pdfPaths),
        dataQualityScore = computeQualityScore(
          title, description, creators,
          Some(publisherName), Some(language), licenseName, sourceUrl, pdfPaths.size),
        ingestedAt = now)
    }
  }
}
