package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Plays the role of the reference's Iceberg catalog scans
  * (`spark.table("catalog.db.t")`, `silver/transformer.py:1339` etc.) —
  * here each table is a single Parquet file under a scale-factor dir.
  * Reads are plain `spark.read.parquet`, so Catalyst predicate pushdown
  * and column pruning apply unchanged.
  */
object Tables {
  // documents/embeddings exist on disk at every scale factor beyond the
  // 8 tables TESTDATA.md enumerates (confirmed by listing); the builder
  // brief's LLM-pipeline operators run over them, so the divergence from
  // the doc is intentional.
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts has shipped as two physical types across testdata
    * vintages: TIMESTAMP(NANOS) (arrives as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and timestamp[us] with no
    * timezone (arrives as TIMESTAMP_NTZ). Normalize both to TIMESTAMP —
    * the session TZ is pinned to UTC in GraftSession, so the NTZ cast is
    * value-preserving, and the nanos path truncates to µs (every
    * consumer compares at ≥ms granularity).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works on it. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
