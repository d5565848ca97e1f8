package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** UDF registrations for the TextFunctions ports, giving the scalar
  * battery SQL/Column reach (SURVEY.md §2.8 "UDF surface mapping").
  * Hot-path relational work stays in native `functions._` (codegen);
  * these cover the record-shaping helpers that genuinely need Scala.
  */
object Udfs {

  val normalizeTextUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.normalizeText(s))

  val ensureLanguageCodeUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.ensureLanguageCode(s))

  val deterministicHashUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.deterministicHash(s))

  /** F12 over the common (resource_id, source_system, source_url, title,
    * description, language) subset with empty creators/license/pdfs —
    * the shape our documents-table queries exercise.
    */
  val fingerprintUdf: UserDefinedFunction =
    udf((resourceId: String, sourceSystem: String, sourceUrl: String,
         title: String, description: String, language: String) =>
      TextFunctions.computeRecordFingerprint(
        resourceId, sourceSystem, Option(sourceUrl), Option(title),
        Option(description), Seq.empty, None, Option(language), None, None, Seq.empty))

  val qualityScoreUdf: UserDefinedFunction =
    udf((title: String, description: String, publisher: String,
         language: String, license: String, sourceUrl: String, pdfCount: Int) =>
      TextFunctions.computeQualityScore(
        Option(title), Option(description), Seq.empty, Option(publisher),
        Option(language), Option(license), Option(sourceUrl), pdfCount))

  val detectLanguageUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.detectLanguage(s))

  val extractKeywordsUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.extractKeywords(s))

  val rollingFingerprintUdf: UserDefinedFunction =
    udf((s: String) => TextFunctions.rollingFingerprint(s))

  /** Register everything for `spark.sql` parity. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("graft_normalize_text", normalizeTextUdf)
    spark.udf.register("graft_language_code", ensureLanguageCodeUdf)
    spark.udf.register("graft_hash", deterministicHashUdf)
    spark.udf.register("graft_fingerprint", fingerprintUdf)
    spark.udf.register("graft_quality_score", qualityScoreUdf)
    spark.udf.register("graft_detect_language", detectLanguageUdf)
    spark.udf.register("graft_keywords", extractKeywordsUdf)
    spark.udf.register("graft_rolling_fp", rollingFingerprintUdf)
  }
}
