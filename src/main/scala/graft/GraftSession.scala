package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the session configuration the reference sets up in
  * `airflow/src/silver/transformer.py:1201-1256` and
  * `airflow/src/gold_analytics.py:96-115` (AQE on, tuned shuffle
  * partitions, UTC session time zone), minus the Iceberg/S3A catalog
  * wiring — our tables are plain Parquet directories (SURVEY.md §1.1).
  *
  * Scale note: shuffle partitions default to the local core count for
  * the test harness; on a real cluster this is expected to be overridden
  * (AQE coalescing makes the initial number a ceiling, not a target).
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt

  /** Build a local session with scale-sane defaults. */
  def local(appName: String = "graft", cores: Int = defaultParallelism): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.mergeSchema", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
