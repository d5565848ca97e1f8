package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The gold-layer star schema (SURVEY §3.2, reference
  * `GoldAnalyticsBuilder.run` at `airflow/src/gold_analytics.py:123-186`):
  * Kimball dims + facts + bridge with `abs(xxhash64)` surrogate keys
  * (`gold_analytics.py:258-263`), built as pure DataFrame programs over
  * silver-shaped inputs.
  *
  * Scale posture: every dim derives from a distinct/aggregate of the
  * fact source (one shuffle each, dim-sized results); fact builds attach
  * dim keys by recomputing the hash expression on the fact side — no
  * join against the dim is needed for key attachment (the reference
  * joins; hash-recompute is the shuffle-free equivalent), while bridge
  * integrity is still asserted by joining (inner ×2, J12).
  */
object GoldAnalytics {

  private def skey(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    abs(xxhash64(cols: _*))

  /** SCD-2 validity columns on every entity dim, mirroring the
    * reference's `effective_from`/`effective_to`/`is_current`
    * (`gold_analytics.py:269-271`): a full-rebuild dim is always the
    * current slice — `effective_from` = load date, open-ended validity,
    * `is_current` = true. `loadDate` defaults to `current_date()` like
    * the reference; pass a literal for deterministic testing. */
  private def scd2(df: DataFrame, loadDate: Column): DataFrame =
    df.withColumn("effective_from", loadDate)
      .withColumn("effective_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** dim_date over the union of every date the facts reference + the
    * fixed fallback row (U1/S7, gold_analytics.py:389-416). */
  def dimDate(spark: SparkSession, dates: DataFrame): DataFrame = {
    val fallback = spark.range(1).select(lit("2024-01-01").cast("date").as("dt"))
    dates.select(col("dt").cast("date")).union(fallback)
      .filter(col("dt").isNotNull).distinct()
      .select(
        (year(col("dt")) * 10000 + month(col("dt")) * 100 + dayofmonth(col("dt"))).as("date_key"),
        col("dt").as("full_date"),
        year(col("dt")).as("year"), quarter(col("dt")).as("quarter"),
        month(col("dt")).as("month"), dayofmonth(col("dt")).as("day_of_month"))
  }

  /** dim_sources (gold_analytics.py:344-374 shape). */
  def dimSources(resources: DataFrame, loadDate: Column = current_date()): DataFrame =
    scd2(resources.groupBy(col("source_system"))
      .agg(count(lit(1)).as("n_resources"))
      .select(skey(col("source_system")).as("source_key"),
        col("source_system").as("source_code"), col("n_resources")), loadDate)

  /** dim_languages with the 'unknown' default join semantics (J10). */
  def dimLanguages(resources: DataFrame, loadDate: Column = current_date()): DataFrame =
    scd2(resources.select(coalesce(col("language"), lit("unknown")).as("language_code"))
      .distinct()
      .select(skey(col("language_code")).as("language_key"), col("language_code")),
      loadDate)

  /** dim_subjects from a reference subjects frame (subject_id,
    * subject_name). */
  def dimSubjects(subjects: DataFrame, loadDate: Column = current_date()): DataFrame =
    scd2(subjects.select(skey(col("subject_id")).as("subject_key"),
      col("subject_id"), col("subject_name")), loadDate)

  /** dim_resources with per-resource chunk stats attached (J11:
    * left join after groupBy.agg). */
  def dimResources(resources: DataFrame, chunks: DataFrame,
                   loadDate: Column = current_date()): DataFrame = {
    val chunkStats = chunks.groupBy("resource_uid")
      .agg(countDistinct("chunk_id").as("n_chunks"),
        sum("token_count").as("total_tokens"))
    scd2(resources
      .join(chunkStats, Seq("resource_uid"), "left")
      .select(
        skey(col("resource_uid")).as("resource_key"),
        col("resource_uid"), col("resource_id"),
        col("source_system"), col("language"), col("title"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens")), loadDate)
  }

  /** bridge_resource_subjects from exploded matches (G2 + J12):
    * one row per (resource, matched subject), keys recomputed. */
  def bridgeResourceSubjects(matches: DataFrame): DataFrame =
    matches.select(
      skey(col("resource_uid")).as("resource_key"),
      skey(col("subject_id")).as("subject_key"),
      col("similarity"))
      .dropDuplicates("resource_key", "subject_key")

  /** fact_subject_coverage (A3, gold_analytics.py:557-567): per subject,
    * how many resources matched + coverage share in basis points. */
  def factSubjectCoverage(subjects: DataFrame, matches: DataFrame,
                          resources: DataFrame): DataFrame = {
    val perSubject = matches.groupBy("subject_id")
      .agg(countDistinct("resource_uid").as("n_matched_resources"))
    val totals = resources.agg(countDistinct("resource_uid").as("n_total")).
      select(col("n_total"))
    subjects.select("subject_id", "subject_name")
      .join(perSubject, Seq("subject_id"), "left")
      .crossJoin(broadcast(totals))
      .select(
        skey(col("subject_id")).as("subject_key"),
        col("subject_id"), col("subject_name"),
        coalesce(col("n_matched_resources"), lit(0L)).as("n_matched_resources"),
        // greatest(n,1): an EMPTY corpus must yield 0 bp coverage rows,
        // not an ANSI divide-by-zero (n_total >= 1 otherwise, so the
        // guard never changes a real result)
        floor(coalesce(col("n_matched_resources"), lit(0L))
          / greatest(col("n_total"), lit(1L)) * 10000)
          .cast("long").as("coverage_bp"))
  }

  /** All gold tables in dependency order (the reference's run() builds
    * and swaps each — pair with TableMerge.createOrReplace to persist). */
  def buildAll(spark: SparkSession, resources: DataFrame, chunks: DataFrame,
               subjects: DataFrame, matches: DataFrame,
               factDates: DataFrame): Map[String, DataFrame] = Map(
    "dim_date" -> dimDate(spark, factDates),
    "dim_sources" -> dimSources(resources),
    "dim_languages" -> dimLanguages(resources),
    "dim_subjects" -> dimSubjects(subjects),
    "dim_resources" -> dimResources(resources, chunks),
    "bridge_resource_subjects" -> bridgeResourceSubjects(matches),
    "fact_subject_coverage" -> factSubjectCoverage(subjects, matches, resources))
}
