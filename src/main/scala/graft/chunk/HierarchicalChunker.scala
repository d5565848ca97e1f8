package graft.chunk

import graft.functions.TextFunctions.{deterministicHash, ensureLanguageCode, stripSurrogateChars}

/** F21 — hierarchical 3-tier chunk emission (semantics of
  * `airflow/src/silver/transformer.py:899-1119`): TOC-driven structure →
  * tier-1 document summary, tier-2 chapter summaries, tier-3 section
  * detail chunks with `parent_chunk_id` links; plus one structure record
  * per asset. Confidence gate: below `tocMinConfidence` (0.60) the TOC is
  * replaced by the flat fallback and summary tiers are suppressed
  * (`should_emit_hierarchical_summary_chunks`: method != "flat").
  *
  * Pure Scala over page texts — runs inside `Dataset.flatMap`, one
  * document per call, so the tree build distributes with the data.
  */
object HierarchicalChunker {

  final case class HierChunk(
      chunk_id: String,
      resource_uid: String,
      asset_uid: String,
      page_no: Int,
      chunk_order: Int,
      chunk_text: String,
      token_count: Int,
      lang: String,
      chunk_type: String,
      chunk_tier: Int,
      chapter_id: Option[String],
      chapter_title: Option[String],
      chapter_number: Option[Int],
      section_id: Option[String],
      section_title: Option[String],
      section_number: Option[String],
      parent_chunk_id: Option[String],
      has_children: Boolean,
      is_summary: Boolean)

  final case class StructureRecord(
      structure_id: String,
      asset_uid: String,
      resource_uid: String,
      has_toc: Boolean,
      toc_method: String,
      toc_confidence: Double,
      total_pages: Int,
      total_chapters: Int,
      total_sections: Int,
      structure_valid: Boolean)

  final case class Config(
      tocMinConfidence: Double = 0.60,
      sectionChunk: Chunker.Config = Chunker.Config(maxChars = 2400, minChars = 400, overlapChars = 300),
      docSummaryMaxChars: Int = 1200,
      chapterSummaryMaxChars: Int = 800,
      toc: TocExtractor.Config = TocExtractor.Config())

  private val WordPattern = "\\w+".r
  private def tokenCount(s: String): Int = WordPattern.findAllIn(s).size

  /** Chunk one document hierarchically. Returns (chunks, structure,
    * status) with the reference's status taxonomy. */
  def chunkDocument(
      resourceUid: String,
      assetUid: String,
      language: String,
      pageTexts: Seq[(Int, String)],
      outline: Seq[TocExtractor.OutlineEntry] = Seq.empty,
      cfg: Config = Config()): (Vector[HierChunk], Option[StructureRecord], String) = {

    if (resourceUid == null || resourceUid.isEmpty || assetUid == null || assetUid.isEmpty)
      return (Vector.empty, None, "missing_keys")

    val pages: Map[Int, String] = pageTexts.collect {
      case (p, t) if t != null => p -> Chunker.normalizePdfText(t)
    }.toMap
    val totalPages = if (pages.isEmpty) 0 else pages.keys.max
    if (totalPages <= 0) return (Vector.empty, None, "page_extract_failed")

    val extracted = TocExtractor.extract(pages, totalPages, outline, cfg.toc)
    // confidence gate: weak structure falls back to flat parts
    val (method, confidence, toc) =
      if (extracted.toc.isEmpty || extracted.confidence < cfg.tocMinConfidence)
        ("flat", 0.50, TocExtractor.flatToc(totalPages, cfg.toc))
      else (extracted.method, extracted.confidence, extracted.toc)
    val emitSummaries = method != "flat"

    val lang = ensureLanguageCode(language)
    val chunks = Vector.newBuilder[HierChunk]
    var sectionGlobalOrder = 0

    def pageRangeText(from: Int, to: Int): String =
      (from to to).flatMap(p => pages.get(p).filter(_.trim.nonEmpty)).mkString("\n\n").trim

    // tier 1 — document summary
    if (emitSummaries) {
      val docSummary = stripSurrogateChars(Summarizer.summaryText(
        pageRangeText(1, totalPages), maxChars = cfg.docSummaryMaxChars))
      if (docSummary.nonEmpty)
        chunks += HierChunk(
          deterministicHash(s"$assetUid::tier1::doc_summary"),
          resourceUid, assetUid, 1, 1, docSummary, tokenCount(docSummary), lang,
          "doc_summary", 1, None, None, None, None, None, None,
          parent_chunk_id = None, has_children = true, is_summary = true)
    }

    for ((chapter, chapterIdx0) <- toc.zipWithIndex) {
      val chapterIdx = chapterIdx0 + 1
      val chStart = math.max(1, math.min(chapter.pageStart, totalPages))
      val chEnd = math.max(chStart, math.min(chapter.pageEnd, totalPages))
      val chapterText = pageRangeText(chStart, chEnd)
      if (chapterText.nonEmpty) {
        // tier 2 — chapter summary
        val chapterChunkId: Option[String] = if (emitSummaries) {
          val summary0 = Summarizer.summaryText(chapterText, maxChars = cfg.chapterSummaryMaxChars)
          val summary = stripSurrogateChars(
            if (summary0.nonEmpty) summary0 else chapter.chapterTitle)
          val id = deterministicHash(s"$assetUid::tier2::${chapter.chapterId}")
          chunks += HierChunk(
            id, resourceUid, assetUid, chStart, chapterIdx, summary,
            tokenCount(summary), lang, "chapter_summary", 2,
            Some(chapter.chapterId), Some(chapter.chapterTitle), Some(chapter.chapterNumber),
            None, None, None, parent_chunk_id = None, has_children = true, is_summary = true)
          Some(id)
        } else None

        // tier 3 — section detail chunks
        val sections =
          if (chapter.sections.nonEmpty) chapter.sections
          else Vector(TocExtractor.TocSection(
            s"${chapter.chapterId}_sec01", s"${chapter.chapterNumber}.1",
            chapter.chapterTitle, chStart, chEnd))
        for (section <- sections) {
          val secStart = math.max(chStart, math.min(section.pageStart, chEnd))
          val secEnd = math.max(secStart, math.min(section.pageEnd, chEnd))
          val sectionText = pageRangeText(secStart, secEnd)
          if (sectionText.nonEmpty) {
            val detailCfg = cfg.sectionChunk.copy(
              minChars = math.max(cfg.sectionChunk.minChars, 220))
            Chunker.chunkTextSmart(sectionText, detailCfg).zipWithIndex.foreach {
              case (detail0, localIdx0) =>
                val detail = stripSurrogateChars(detail0)
                if (detail.nonEmpty) {
                  sectionGlobalOrder += 1
                  chunks += HierChunk(
                    deterministicHash(
                      s"$assetUid::tier3::${section.sectionId}::${localIdx0 + 1}::${detail.take(128)}"),
                    resourceUid, assetUid, secStart, sectionGlobalOrder, detail,
                    tokenCount(detail), lang, "section_detail", 3,
                    Some(chapter.chapterId), Some(chapter.chapterTitle),
                    Some(chapter.chapterNumber),
                    Some(section.sectionId), Some(section.sectionTitle),
                    Some(section.sectionNumber),
                    parent_chunk_id = chapterChunkId, has_children = false,
                    is_summary = false)
                }
            }
          }
        }
      }
    }

    val structure = StructureRecord(
      deterministicHash(assetUid), assetUid, resourceUid,
      has_toc = method != "flat", toc_method = method, toc_confidence = confidence,
      total_pages = totalPages, total_chapters = toc.size,
      total_sections = toc.map(_.sections.size).sum,
      structure_valid = extracted.structureValid)

    val result = chunks.result()
    if (result.isEmpty) (Vector.empty, Some(structure), "no_chunks")
    else (result, Some(structure), "ok")
  }
}
