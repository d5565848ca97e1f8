package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedJoinQueries, CdcQueries, CoreQueries, CoverageQueries, PipelineQueries, SinkQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry = the operator batteries:
  *  - [[graft.queries.CoreQueries]]     relational operators (SURVEY §2.2-2.8)
  *  - [[graft.queries.CdcQueries]]      incremental/CDC + MERGE sinks (§2.9, §2.1)
  *  - [[graft.queries.PipelineQueries]] LLM-pipeline ops (dedup / similarity /
  *    text analysis / hybrid search / event-time windows)
  */
object SparkEntry {

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = {
    val qs = CoreQueries.queries ++ AdvancedJoinQueries.queries ++ CdcQueries.queries ++
      PipelineQueries.queries ++ CoverageQueries.queries ++ SinkQueries.queries
    val dups = qs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names would silently collapse in toMap: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way star join (J14) — the reference's headline gold shape. */
  def entry(spark: SparkSession): DataFrame =
    queries("j14_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = all.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ AdvancedJoinQueries.oracles ++ CdcQueries.oracles ++
      PipelineQueries.oracles ++ CoverageQueries.oracles ++ SinkQueries.oracles
}
