package graft.functions

import graft.functions.TextFunctions.{cleanScalar, normalizeText}

/** F14 — `SubjectMatcher` (transformer.py:371-476): subject tagging by
  * max-merged TF-IDF cosine, exact-substring scores and token overlap.
  *
  * The model is built once on the driver from the (dim-sized) subject
  * reference corpus, and the instance is serializable — ship it into
  * executors via `sparkContext.broadcast` / closure capture and call
  * [[matchSubjects]] inside a UDF or typed map (mirrors the reference's
  * broadcast at transformer.py:1492-1493). No per-row corpus access, no
  * collect: at 100 TB the matcher is a fixed ~O(|subjects|·|vocab|)
  * payload riding the task closure.
  *
  * TF-IDF details (from-scratch, sklearn-shaped): tokens are `\w{2,}`
  * over [[normalizeText]] output minus a compact English stop list,
  * unigrams + bigrams, smoothed idf `ln((1+n)/(1+df)) + 1`, raw tf,
  * L2-normalized vectors ⇒ cosine = dot product. Scoring merge: code
  * substring .99, English-name substring .94, name substring .92, token
  * overlap `overlap/min(|tokens|,6)` when ≥2 tokens overlap (round 3),
  * model cosine (round 4); threshold default 0.55, top-5 by score desc
  * with subject-id tiebreak.
  */
object SubjectMatcher {

  final case class Subject(
      subjectId: Int,
      name: Option[String],
      nameEn: Option[String],
      code: Option[String])

  final case class SubjectMatch(
      subjectId: Int,
      name: Option[String],
      nameEn: Option[String],
      code: Option[String],
      similarity: Double,
      matchedText: Option[String])

  private val TokenPattern = "[a-z0-9]{2,}".r

  private[functions] def tokenize(normalized: String): Vector[String] =
    TokenPattern.findAllIn(normalized).toVector
      .filterNot(TextFunctions.EnStopwords.contains)

  private[functions] def ngrams12(tokens: Vector[String]): Vector[String] =
    tokens ++ tokens.sliding(2).collect { case Vector(a, b) => s"$a $b" }

  private def round(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
}

final class SubjectMatcher(
    subjects0: Seq[SubjectMatcher.Subject],
    threshold: Double = 0.55) extends Serializable {

  import SubjectMatcher._

  private final case class Entry(
      subject: Subject,
      tokens: Set[String],
      normName: String,
      normNameEn: String,
      normCode: String,
      vec: Map[String, Double])

  // ---- fit (driver-side, corpus is dim-sized) -------------------------

  private val idf: Map[String, Double] = {
    val corpusGrams = subjects0.map { s =>
      val text = Seq(s.name, s.nameEn, s.code).flatten.flatMap(cleanScalar(_)).mkString(" ")
      ngrams12(tokenize(normalizeText(text)))
    }
    val n = corpusGrams.size
    val df = corpusGrams.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    df.map { case (t, d) => t -> (math.log((1.0 + n) / (1.0 + d)) + 1.0) }.toMap
  }

  private def vectorize(grams: Vector[String]): Map[String, Double] = {
    val tf = grams.filter(idf.contains).groupBy(identity).view.mapValues(_.size.toDouble)
    val raw = tf.map { case (t, f) => t -> f * idf(t) }.toMap
    val norm = math.sqrt(raw.valuesIterator.map(x => x * x).sum)
    if (norm == 0.0) Map.empty else raw.view.mapValues(_ / norm).toMap
  }

  private val entries: Vector[Entry] = subjects0.toVector.map { s =>
    val name = s.name.flatMap(cleanScalar(_))
    val nameEn = s.nameEn.flatMap(cleanScalar(_))
    val code = s.code.flatMap(cleanScalar(_))
    val joined = Seq(name, nameEn, code).flatten.mkString(" ")
    Entry(
      s.copy(name = name, nameEn = nameEn, code = code),
      normalizeText(joined).split(" ").filter(_.nonEmpty).toSet,
      normalizeText(name.getOrElse("")),
      normalizeText(nameEn.getOrElse("")),
      normalizeText(code.getOrElse("")),
      vectorize(ngrams12(tokenize(normalizeText(joined)))))
  }

  // ---- match (executor-side, per record) ------------------------------

  def matchSubjects(
      title: Option[String],
      description: Option[String],
      topK: Int = 5): Seq[SubjectMatch] = {
    val haystack = normalizeText(Seq(title, description).flatten.mkString(" "))
    if (haystack.isEmpty) return Seq.empty
    val hayTokens = haystack.split(" ").filter(_.nonEmpty).toSet
    val queryVec = vectorize(ngrams12(tokenize(haystack)))

    val matches = entries.flatMap { e =>
      var score = 0.0
      var matchedText: Option[String] = None
      // NOTE: later substring branches overwrite matchedText even when a
      // higher-scoring earlier branch set it — faithful to the reference
      // (transformer.py:435-446 assigns matched_text unconditionally per
      // hit), so provenance follows the LAST matching rule, score the max.
      if (e.normCode.nonEmpty && haystack.contains(e.normCode)) {
        score = math.max(score, 0.99); matchedText = e.subject.code
      }
      if (e.normNameEn.nonEmpty && haystack.contains(e.normNameEn)) {
        score = math.max(score, 0.94); matchedText = e.subject.nameEn
      }
      if (e.normName.nonEmpty && haystack.contains(e.normName)) {
        score = math.max(score, 0.92); matchedText = e.subject.name
      }
      if (e.tokens.nonEmpty) {
        val overlap = (e.tokens & hayTokens).size
        if (overlap >= 2) {
          val tokenScore = overlap.toDouble / math.max(1, math.min(e.tokens.size, 6))
          if (round(tokenScore, 3) > score) {
            score = round(tokenScore, 3)
            if (matchedText.isEmpty) matchedText = e.subject.nameEn.orElse(e.subject.name)
          }
        }
      }
      val model = e.vec.foldLeft(0.0) { case (acc, (t, w)) =>
        acc + queryVec.getOrElse(t, 0.0) * w
      }
      if (model > 0 && round(model, 4) > score) {
        score = round(model, 4)
        if (matchedText.isEmpty) matchedText = e.subject.nameEn.orElse(e.subject.name)
      }
      if (score >= threshold)
        Some(SubjectMatch(e.subject.subjectId, e.subject.name, e.subject.nameEn,
          e.subject.code, round(score, 4), matchedText))
      else None
    }
    matches.sortBy(m => (-m.similarity, m.subjectId)).take(topK)
  }
}
