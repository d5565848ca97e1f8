package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the session configuration the reference sets up in
  * `airflow/src/silver/transformer.py:1201-1256` and
  * `airflow/src/gold_analytics.py:96-115` (AQE on, tuned shuffle
  * partitions), minus the Iceberg/S3A catalog wiring — our tables are
  * plain Parquet directories (SURVEY.md §1.1). The UTC session time
  * zone is a graft-side determinism choice (stable oracle comparison),
  * not mirrored from the reference, which runs on the JVM default TZ.
  *
  * Scale note: shuffle partitions default to the local core count for
  * the test harness; on a real cluster this is expected to be overridden
  * (AQE coalescing makes the initial number a ceiling, not a target).
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(Runtime.getRuntime.availableProcessors())

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
      // native graft function surface (graft_cosine, …) — a Catalyst
      // Expression with codegen, not a UDF (graft.expressions)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.mergeSchema", "false")
      // keep catalog-table files (j15 bucketed fixtures) under target/ so
      // a battery run never litters the repo working tree
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/graft-state/warehouse").getAbsolutePath)
      // events.parquet stores TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as long and let Tables.events rebuild the µs
      // timestamp (ns→µs truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
