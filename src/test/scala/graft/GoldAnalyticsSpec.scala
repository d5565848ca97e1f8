package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.GoldAnalytics

/** Gold star-schema build: surrogate-key integrity (hash-recompute
  * equals dim join), bridge referential integrity, coverage math, and
  * date-dim domain.
  */
class GoldAnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  private def fixtures: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val resources = Seq(
      ("uid1", "r1", "mit_ocw", "en", "Algorithms"),
      ("uid2", "r2", "openstax", "vi", "Biology"),
      ("uid3", "r3", "mit_ocw", null, "Untitled thing"))
      .toDF("resource_uid", "resource_id", "source_system", "language", "title")
    val chunks = Seq(
      ("uid1", "c1", 100), ("uid1", "c2", 150), ("uid2", "c3", 80))
      .toDF("resource_uid", "chunk_id", "token_count")
    val subjects = Seq((1, "Machine Learning"), (2, "Biology"), (3, "Networks"))
      .toDF("subject_id", "subject_name")
    val matches = Seq(
      ("uid1", 1, 0.94), ("uid2", 2, 0.92), ("uid2", 2, 0.92)) // dup on purpose
      .toDF("resource_uid", "subject_id", "similarity")
    val dates = Seq("2026-01-01", "2026-01-02").toDF("dt")
      .select(col("dt").cast("date").as("dt"))
    (resources, chunks, subjects, matches, dates)
  }

  test("buildAll produces every table; surrogate keys are unique per dim") {
    val (resources, chunks, subjects, matches, dates) = fixtures
    val gold = GoldAnalytics.buildAll(spark, resources, chunks, subjects, matches, dates)
    assert(gold.keySet == Set("dim_date", "dim_sources", "dim_languages",
      "dim_subjects", "dim_resources", "bridge_resource_subjects", "fact_subject_coverage"))
    for ((name, df) <- gold if name.startsWith("dim_")) {
      val keyCol = df.columns.find(_.endsWith("_key")).get
      assert(df.select(keyCol).distinct().count() == df.count(), s"$name keys not unique")
    }
  }

  test("entity dims carry SCD-2 validity columns (gold_analytics.py:269-271)") {
    import spark.implicits._
    val (resources, chunks, subjects, _, _) = fixtures
    val loadDate = lit("2026-02-03").cast("date")
    val dims = Seq(
      GoldAnalytics.dimSources(resources, loadDate),
      GoldAnalytics.dimLanguages(resources, loadDate),
      GoldAnalytics.dimSubjects(subjects, loadDate),
      GoldAnalytics.dimResources(resources, chunks, loadDate))
    for (dim <- dims) {
      assert(Seq("effective_from", "effective_to", "is_current")
        .forall(dim.columns.contains), s"missing SCD-2 columns in ${dim.columns.toSeq}")
      val rows = dim.select($"effective_from".cast("string"),
        $"effective_to".cast("string"), $"is_current")
        .as[(String, String, Boolean)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (from, to, current) =>
        assert(from == "2026-02-03" && to == null && current)
      }
    }
    // default load date is current_date(), mirroring the reference
    assert(GoldAnalytics.dimSources(resources).columns.contains("effective_from"))
  }

  test("dim_resources attaches chunk stats; missing stats default to 0") {
    import spark.implicits._
    val (resources, chunks, _, _, _) = fixtures
    val dim = GoldAnalytics.dimResources(resources, chunks)
    val byUid = dim.select("resource_uid", "n_chunks", "total_tokens")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byUid("uid1") == (2L, 250L))
    assert(byUid("uid2") == (1L, 80L))
    assert(byUid("uid3") == (0L, 0L))
  }

  test("bridge integrity: every bridge key resolves against its dim (J12)") {
    val (resources, chunks, subjects, matches, _) = fixtures
    val bridge = GoldAnalytics.bridgeResourceSubjects(matches)
    assert(bridge.count() == 2) // dup row collapsed
    val dimR = GoldAnalytics.dimResources(resources, chunks)
    val dimS = GoldAnalytics.dimSubjects(subjects)
    val resolved = bridge
      .join(dimR, Seq("resource_key"), "inner")
      .join(dimS, Seq("subject_key"), "inner")
    assert(resolved.count() == bridge.count(), "dangling bridge keys")
  }

  test("coverage fact: matched share in basis points") {
    import spark.implicits._
    val (resources, _, subjects, matches, _) = fixtures
    val fact = GoldAnalytics.factSubjectCoverage(subjects, matches, resources)
    val byId = fact.select("subject_id", "n_matched_resources", "coverage_bp")
      .as[(Int, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1) == (1L, 3333L)) // 1 of 3 resources
    assert(byId(2) == (1L, 3333L))
    assert(byId(3) == (0L, 0L))
  }

  test("dim_date includes the fallback row and calendar attributes") {
    import spark.implicits._
    val (_, _, _, _, dates) = fixtures
    val dim = GoldAnalytics.dimDate(spark, dates)
    assert(dim.count() == 3) // 2 dates + fallback
    assert(dim.filter($"date_key" === 20240101).count() == 1)
    val row = dim.filter($"date_key" === 20260102).head()
    assert(row.getAs[Int]("year") == 2026 && row.getAs[Int]("day_of_month") == 2)
  }
}
