package graft.chunk

import graft.functions.TextFunctions.normalizeText

/** F22 — multi-method TOC extraction cascade (semantics of
  * `airflow/src/hierarchical/toc_extractor.py:49-408`), operating on
  * pre-extracted page texts (the PDF byte layer is outside this
  * environment; pages are this engine's document input shape throughout,
  * as in [[Chunker]]):
  *
  *  1. provided outline (a real PDF outline, conf 0.95) — caller-supplied;
  *  2. TOC-page parse (conf 0.85): find a contents page, parse
  *     `title …… page` lines into chapters/sections, estimate the
  *     logical→physical page offset by median title match;
  *  3. regex chapter headers (conf 0.70): first chapter-shaped line per page;
  *  4. flat fixed-size parts (conf 0.50).
  *
  * Validation requires in-range, monotonically non-decreasing chapter
  * starts; end pages are filled from the next sibling's start.
  */
object TocExtractor {

  final case class TocSection(
      sectionId: String,
      sectionNumber: String,
      sectionTitle: String,
      pageStart: Int,
      pageEnd: Int)

  final case class TocChapter(
      chapterId: String,
      chapterNumber: Int,
      chapterTitle: String,
      pageStart: Int,
      pageEnd: Int,
      sections: Vector[TocSection])

  final case class TocResult(
      method: String,
      confidence: Double,
      toc: Vector[TocChapter],
      totalPages: Int,
      structureValid: Boolean)

  /** An outline entry as a real PDF reader would hand it over:
    * (level, title, 1-based page or None). */
  final case class OutlineEntry(level: Int, title: String, page: Option[Int])

  final case class Config(fallbackChapterSize: Int = 50, tocScanPages: Int = 12) {
    require(fallbackChapterSize >= 10 && tocScanPages >= 5)
  }

  private val ChapterPatterns = Seq(
    "(?i)^(chapter|chương|chuong|phần|phan)\\s+([0-9]+|[ivxlcdm]+)\\b".r,
    "(?i)^([0-9]+)\\.\\s+[A-ZÀ-Ỹ]".r,
    "(?i)^([IVXLCDM]+)\\.\\s+".r)

  private val SectionPatterns = Seq(
    "^\\d+\\.\\d+(\\.\\d+)?\\b".r,
    "(?i)^(section|mục|muc)\\s+\\d+".r)

  private[graft] def isChapterTitle(t: String): Boolean =
    ChapterPatterns.exists(_.findPrefixOf(t.trim).isDefined)

  private[graft] def isSectionTitle(t: String): Boolean =
    SectionPatterns.exists(_.findPrefixOf(t.trim).isDefined)

  private[graft] def romanToInt(roman: String): Int = {
    val values = Map('i' -> 1, 'v' -> 5, 'x' -> 10, 'l' -> 50,
      'c' -> 100, 'd' -> 500, 'm' -> 1000)
    var total = 0
    var prev = 0
    for (ch <- roman.toLowerCase.reverse) {
      val v = values.getOrElse(ch, 0)
      if (v < prev) total -= v else total += v
      prev = v
    }
    math.max(1, total)
  }

  // hot-path patterns precompiled once — String.replaceAll / inline .r
  // recompile per call, and these run per LINE across every document
  private val LeadingNumber = "\\b(\\d{1,3})\\b".r
  private val LeadingRoman = "(?i)\\b([IVXLCDM]{1,8})\\b".r
  private val SectionNumber = "(\\d+\\.\\d+(?:\\.\\d+)?)".r
  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  private val TitleTrim = java.util.regex.Pattern.compile("^[ .\\-\\t]+|[ .\\-\\t]+$")

  private def extractLeadingNumber(text: String): Option[Int] = {
    LeadingNumber.findFirstMatchIn(text).map(_.group(1).toInt)
      .orElse(LeadingRoman.findFirstMatchIn(text)
        .map(m => romanToInt(m.group(1))))
  }

  private def extractSectionNumber(text: String): Option[String] =
    SectionNumber.findFirstMatchIn(text).map(_.group(1))

  private def cleanTitle(title: String): String =
    TitleTrim.matcher(WsRun.matcher(title).replaceAll(" "))
      .replaceAll("").take(220)

  private def clampPage(v: Int, totalPages: Int): Int = math.max(1, math.min(v, totalPages))

  // ---- cascade --------------------------------------------------------

  def extract(
      pageTexts: Map[Int, String],
      totalPages: Int,
      outline: Seq[OutlineEntry] = Seq.empty,
      cfg: Config = Config()): TocResult = {
    if (totalPages <= 0)
      return TocResult("flat", 0.0, Vector.empty, 0, structureValid = false)

    val fromOutline = parseOutline(outline, totalPages)
    if (validate(fromOutline, totalPages))
      return finalize("pdf_outline", 0.95, fromOutline, totalPages)

    val fromTocPage = extractFromTocPages(pageTexts, totalPages, cfg)
    if (validate(fromTocPage, totalPages))
      return finalize("toc_page", 0.85, fromTocPage, totalPages)

    val fromRegex = extractWithRegex(pageTexts, totalPages)
    if (validate(fromRegex, totalPages))
      return finalize("regex", 0.70, fromRegex, totalPages)

    finalize("flat", 0.50, flatToc(totalPages, cfg), totalPages)
  }

  /** The BYTE-LAYER entry (the reference's `extract(pdf_bytes)`,
    * toc_extractor.py:49-95): decode real PDF bytes through
    * [[graft.multimodal.PdfCodec]] — xref walk, FlateDecode content
    * streams, outline-tree flatten with /Dest page resolution — then
    * run the same cascade with the REAL outline as method 1 and the
    * real extracted page texts under methods 2–4. Undecodable bytes
    * degrade to the reference's zero-page result (its
    * PyPDF2-unavailable / parse-exception path). */
  def extractFromPdf(bytes: Array[Byte], cfg: Config = Config()): TocResult =
    graft.multimodal.PdfCodec.decode(bytes) match {
      case None =>
        TocResult("flat", 0.0, Vector.empty, 0, structureValid = false)
      case Some(doc) => extractFromDoc(doc, cfg)
    }

  /** The cascade over an ALREADY-decoded document — for callers that
    * hold the decode result for their own use (mm_pdf_outline reads
    * the page texts for its fingerprint column): decoding is the
    * expensive half of the byte path (xref walk + FlateDecode of every
    * content stream), and running it once per row instead of twice is
    * free (r20). Identical result to [[extractFromPdf]] on the same
    * bytes by construction. */
  def extractFromDoc(doc: graft.multimodal.PdfCodec.PdfDoc,
                     cfg: Config = Config()): TocResult =
    extract(
      doc.pages.zipWithIndex.map { case (t, i) => (i + 1) -> t }.toMap,
      doc.totalPages,
      doc.outline.map { case (lv, t, p) => OutlineEntry(lv, t, p) },
      cfg)

  /** Method 1 — a provided outline: top-level entries with pages become
    * chapters, deeper entries sections of the current chapter. */
  private def parseOutline(outline: Seq[OutlineEntry], totalPages: Int): Vector[TocChapter] = {
    if (outline.isEmpty) return Vector.empty
    val minLevel = outline.iterator.map(_.level).min
    val chapters = Vector.newBuilder[TocChapter]
    var current: Option[TocChapter] = None
    var counter = 0
    for (e <- outline; title = cleanTitle(e.title); if title.nonEmpty; page <- e.page) {
      val p = clampPage(page, totalPages)
      if (e.level == minLevel) {
        current.foreach(chapters += _)
        counter += 1
        current = Some(TocChapter(f"ch$counter%02d",
          extractLeadingNumber(title).getOrElse(counter), title, p, p, Vector.empty))
      } else current = current.map { ch =>
        val idx = ch.sections.size + 1
        ch.copy(sections = ch.sections :+ TocSection(
          s"${ch.chapterId}_sec${"%02d".format(idx)}",
          extractSectionNumber(title).getOrElse(s"${ch.chapterNumber}.$idx"),
          title, p, p))
      }
    }
    current.foreach(chapters += _)
    chapters.result()
  }

  /** Method 2 — contents-page parse + page-offset estimation. */
  private def extractFromTocPages(
      pageTexts: Map[Int, String], totalPages: Int, cfg: Config): Vector[TocChapter] = {
    val tocLines = (1 to math.min(totalPages, cfg.tocScanPages)).flatMap { p =>
      val text = pageTexts.getOrElse(p, "")
      if (text.nonEmpty && isTocPage(text))
        text.linesIterator.map(_.trim).filter(_.nonEmpty)
      else Iterator.empty
    }
    if (tocLines.isEmpty) return Vector.empty
    val toc = parseTocLines(tocLines.toVector)
    if (toc.isEmpty) Vector.empty
    else applyOffset(toc, estimatePageOffset(pageTexts, toc, totalPages), totalPages)
  }

  private val DottedLeader = "\\.{2,}\\s*\\d+\\s*$".r
  private val TrailingPage = "(\\d{1,4})\\s*$".r

  private[graft] def isTocPage(text: String): Boolean = {
    val lowered = normalizeText(text)
    val terms = Seq("table of contents", "contents", "muc luc", "noi dung")
    terms.exists(lowered.contains) ||
      // ≥3 dotted-leader lines ("Title ..... 12") mark a contents page
      text.linesIterator.count(l => DottedLeader.findFirstIn(l).isDefined) >= 3
  }

  private def parseTocLines(lines: Vector[String]): Vector[TocChapter] = {
    val chapters = Vector.newBuilder[TocChapter]
    var current: Option[TocChapter] = None
    var counter = 0
    for (raw <- lines) {
      val line = WsRun.matcher(raw).replaceAll(" ").trim
      val pageMatch = TrailingPage.findFirstMatchIn(line)
      for (m <- pageMatch) {
        val pageNo = m.group(1).toInt
        val head = cleanTitle(line.substring(0, m.start))
        if (head.nonEmpty) {
          if (isChapterTitle(head)) {
            current.foreach(chapters += _)
            counter += 1
            current = Some(TocChapter(f"ch$counter%02d",
              extractLeadingNumber(head).getOrElse(counter), head, pageNo, pageNo, Vector.empty))
          } else if (isSectionTitle(head) && current.isDefined) {
            current = current.map { ch =>
              val idx = ch.sections.size + 1
              ch.copy(sections = ch.sections :+ TocSection(
                s"${ch.chapterId}_sec${"%02d".format(idx)}",
                extractSectionNumber(head).getOrElse(s"${ch.chapterNumber}.$idx"),
                head, pageNo, pageNo))
            }
          }
        }
      }
    }
    current.foreach(chapters += _)
    chapters.result()
  }

  /** Median offset between a chapter's logical page and the physical page
    * whose text matches most of its title tokens. Contents pages are
    * excluded from the scan — they contain every chapter title and would
    * anchor all offsets to themselves (the reference scans them too,
    * `toc_extractor.py:301-327`, which skews its estimates; deliberate
    * divergence). */
  private def estimatePageOffset(
      pageTexts: Map[Int, String], toc: Vector[TocChapter], totalPages: Int): Int = {
    val scanned = (1 to math.min(totalPages, 140)).flatMap { p =>
      val t = pageTexts.getOrElse(p, "")
      if (t.nonEmpty && !isTocPage(t)) Some((p, normalizeText(t))) else None
    }
    val offsets = toc.take(6).flatMap { ch =>
      val tokens = normalizeText(ch.chapterTitle).split(" ").filter(_.length > 3).take(4)
      if (tokens.isEmpty || ch.pageStart <= 0) None
      else scanned.find { case (_, text) =>
        tokens.count(text.contains) >= math.max(1, tokens.length - 1)
      }.map { case (p, _) => p - ch.pageStart }
    }
    if (offsets.isEmpty) 0
    else {
      val sorted = offsets.sorted
      val mid = sorted.size / 2
      if (sorted.size % 2 == 1) sorted(mid)
      else math.round((sorted(mid - 1) + sorted(mid)) / 2.0).toInt
    }
  }

  private def applyOffset(toc: Vector[TocChapter], offset: Int, totalPages: Int): Vector[TocChapter] =
    toc.map { ch =>
      ch.copy(
        pageStart = clampPage(ch.pageStart + offset, totalPages),
        sections = ch.sections.map(s => s.copy(pageStart = clampPage(s.pageStart + offset, totalPages))))
    }

  /** Method 3 — first chapter-shaped header line per page. */
  private def extractWithRegex(pageTexts: Map[Int, String], totalPages: Int): Vector[TocChapter] = {
    val chapters = Vector.newBuilder[TocChapter]
    var counter = 0
    for (p <- 1 to totalPages) {
      val text = pageTexts.getOrElse(p, "")
      if (text.nonEmpty) {
        text.linesIterator.map(cleanTitle).find(l => l.nonEmpty && isChapterTitle(l))
          .foreach { title =>
            counter += 1
            chapters += TocChapter(f"ch$counter%02d", counter, title, p, p, Vector.empty)
          }
      }
    }
    chapters.result()
  }

  /** Method 4 — flat fixed-size parts. */
  private[graft] def flatToc(totalPages: Int, cfg: Config = Config()): Vector[TocChapter] =
    (1 to totalPages by cfg.fallbackChapterSize).zipWithIndex.map { case (start, i) =>
      TocChapter(f"ch${i + 1}%02d", i + 1, s"Part ${i + 1}", start,
        math.min(start + cfg.fallbackChapterSize - 1, totalPages), Vector.empty)
    }.toVector

  private[graft] def validate(toc: Vector[TocChapter], totalPages: Int): Boolean = {
    if (toc.isEmpty) return false
    val starts = toc.map(_.pageStart)
    starts.forall(p => p >= 1 && p <= totalPages) && starts == starts.sorted
  }

  private def finalize(method: String, confidence: Double,
                       toc: Vector[TocChapter], totalPages: Int): TocResult = {
    val filled = fillEndPages(toc, totalPages)
    TocResult(method, confidence, filled, totalPages, validate(filled, totalPages))
  }

  private def fillEndPages(toc: Vector[TocChapter], totalPages: Int): Vector[TocChapter] =
    toc.zipWithIndex.map { case (ch, idx) =>
      val nextStart = if (idx < toc.size - 1) toc(idx + 1).pageStart else totalPages + 1
      val chapterEnd = math.max(ch.pageStart, clampPage(nextStart - 1, totalPages))
      val sections = ch.sections.zipWithIndex.map { case (s, sIdx) =>
        val nextSec = if (sIdx < ch.sections.size - 1) ch.sections(sIdx + 1).pageStart
          else chapterEnd + 1
        s.copy(pageEnd = math.max(s.pageStart, clampPage(nextSec - 1, totalPages)))
      }
      ch.copy(pageEnd = chapterEnd, sections = sections)
    }
}
