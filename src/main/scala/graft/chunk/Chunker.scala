package graft.chunk

import graft.functions.TextFunctions.{deterministicHash, ensureLanguageCode, stripSurrogateChars}

/** Text chunkers F17-F20, faithful ports of the reference's
  * `airflow/src/silver/transformer.py:689-893` operating on
  * pre-extracted page text (PDF parsing is out of the hot path —
  * SURVEY.md §7.1 item 5). Pure Scala: used inside `Dataset.flatMap`
  * so chunking distributes with the data, unlike the reference's
  * Python `mapPartitions` boundary.
  */
object Chunker {

  /** Chunking configuration; defaults mirror the production env
    * (`docker-compose.yml:99-110`): max 2400 chars, overlap 300, min 400.
    */
  final case class Config(maxChars: Int = 2400, minChars: Int = 400, overlapChars: Int = 300)

  /** F17 — `_normalize_pdf_text` (transformer.py:689-695): de-hyphenate
    * line breaks, CR→LF, collapse runs of spaces/tabs and 3+ newlines.
    */
  // precompiled: String.replaceAll compiles its pattern per call and
  // this normalization runs once per document page
  private val Dehyphen = java.util.regex.Pattern.compile("-\\s*\\n\\s*")
  private val SpaceRun = java.util.regex.Pattern.compile("[ \\t]+")
  private val NewlineRun = java.util.regex.Pattern.compile("\\n{3,}")

  def normalizePdfText(text0: String): String = {
    var text = stripSurrogateChars(text0)
    text = Dehyphen.matcher(text).replaceAll("")
    text = text.replace("\r", "\n")
    text = SpaceRun.matcher(text).replaceAll(" ")
    text = NewlineRun.matcher(text).replaceAll("\n\n")
    text.trim
  }

  /** F18 — `_split_long_segment` (transformer.py:711-748): sliding window
    * of `maxChars` with `overlap` (clamped to max/2), boundary snapped to
    * the last `\n`, `. `, `? ` or `! ` inside the window tail.
    */
  def splitLongSegment(text0: String, cfg: Config = Config()): Vector[String] = {
    val text = stripSurrogateChars(text0).trim
    if (text.isEmpty) return Vector.empty
    val maxChars = cfg.maxChars
    val minChars = cfg.minChars
    val overlap = math.min(math.max(cfg.overlapChars, 0), math.max(maxChars / 2, 0))
    val step = math.max(1, maxChars - overlap)
    val chunks = Vector.newBuilder[String]
    var start = 0
    var done = false
    while (start < text.length && !done) {
      var end = math.min(start + maxChars, text.length)
      if (end < text.length) {
        val windowStart = math.min(end, start + math.max(minChars, maxChars / 2))
        // String.lastIndexOf(str, fromIndex) searches backwards from
        // fromIndex; Python rfind(sub, lo, hi) bounds the *match start* to
        // [lo, hi-len(sub)] — replicate that window exactly.
        def rfind(sub: String): Int = {
          val hi = end - sub.length
          if (hi < windowStart) -1
          else {
            val pos = text.lastIndexOf(sub, hi)
            if (pos >= windowStart) pos else -1
          }
        }
        val splitPos = Seq(rfind("\n"), rfind(". "), rfind("? "), rfind("! ")).max
        if (splitPos > start) end = splitPos + 1
      }
      val chunk = text.substring(start, end).trim
      if (chunk.nonEmpty && (chunk.length >= minChars || end == text.length))
        chunks += chunk
      if (end >= text.length) done = true
      else start = if (end <= start) start + step else math.max(start + 1, end - overlap)
    }
    chunks.result()
  }

  /** F19 — `_chunk_text_smart` (transformer.py:750-794): paragraph packing
    * (split on blank lines, pack ≤ maxChars with "\n\n" joins); paragraphs
    * longer than maxChars spill to the sliding-window splitter.
    */
  def chunkTextSmart(text0: String, cfg: Config = Config()): Vector[String] = {
    val text = stripSurrogateChars(text0)
    val paragraphs = text.split("\\n{2,}").iterator.map(_.trim).filter(_.nonEmpty).toVector
    if (paragraphs.isEmpty) return splitLongSegment(text, cfg)

    val chunks = Vector.newBuilder[String]
    var produced = 0
    var currentParts = Vector.empty[String]
    var currentLen = 0

    def flush(): Unit = {
      if (currentParts.nonEmpty) {
        val chunk = currentParts.mkString("\n\n").trim
        if (chunk.nonEmpty) { chunks += chunk; produced += 1 }
      }
      currentParts = Vector.empty
      currentLen = 0
    }

    for (para <- paragraphs) {
      if (para.length > cfg.maxChars) {
        flush()
        val spill = splitLongSegment(para, cfg)
        chunks ++= spill; produced += spill.size
      } else {
        val projected = currentLen + (if (currentParts.nonEmpty) 2 else 0) + para.length
        if (projected <= cfg.maxChars) {
          currentParts :+= para
          currentLen = projected
        } else {
          flush()
          currentParts = Vector(para)
          currentLen = para.length
        }
      }
    }
    flush()
    val result = chunks.result()
    if (result.nonEmpty) result else splitLongSegment(text, cfg)
  }

  /** One tier-3 chunk row — the flat-chunking output schema
    * (transformer.py:844-893, silver `oer_chunks` subset that flat
    * chunking populates; hierarchy columns stay null/default).
    */
  final case class ChunkRow(
      chunk_id: String,
      resource_uid: String,
      asset_uid: String,
      page_no: Int,
      chunk_order: Int,
      chunk_text: String,
      token_count: Int,
      lang: String,
      chunk_type: String = "section_detail",
      chunk_tier: Int = 3,
      parent_chunk_id: Option[String] = None,
      has_children: Boolean = false,
      is_summary: Boolean = false)

  private val WordPattern = "\\w+".r

  /** F20 — `chunk_document_record_with_status` (transformer.py:844-893)
    * over pre-extracted page texts: per page, smart-chunk and emit tier-3
    * rows with sha256 ids over `asset_uid::page::order::text[:128]` and
    * `\w+` token counts. Returns (rows, status) with the same status
    * taxonomy ("missing_keys" / "empty_pdf_text" / "ok").
    */
  def chunkDocumentRecord(
      resourceUid: String,
      assetUid: String,
      language: String,
      pageTexts: Seq[(Int, String)],
      cfg: Config = Config()): (Vector[ChunkRow], String) = {
    if (resourceUid == null || resourceUid.isEmpty || assetUid == null || assetUid.isEmpty)
      return (Vector.empty, "missing_keys")
    val lang = ensureLanguageCode(language)
    val rows = Vector.newBuilder[ChunkRow]
    var any = false
    for ((pageNo, raw) <- pageTexts.sortBy(_._1)) {
      val pageText = normalizePdfText(Option(raw).getOrElse(""))
      if (pageText.nonEmpty) {
        chunkTextSmart(pageText, cfg).zipWithIndex.foreach { case (chunk, i) =>
          if (chunk.nonEmpty) {
            any = true
            val safe = stripSurrogateChars(chunk)
            val tokenCount = WordPattern.findAllIn(safe).size
            val chunkOrder = i + 1
            val chunkId = deterministicHash(
              s"$assetUid::$pageNo::$chunkOrder::${safe.take(128)}")
            rows += ChunkRow(chunkId, resourceUid, assetUid, pageNo, chunkOrder,
              safe, tokenCount, lang)
          }
        }
      }
    }
    if (!any) (Vector.empty, "empty_pdf_text") else (rows.result(), "ok")
  }
}
