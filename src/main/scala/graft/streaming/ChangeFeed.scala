package graft.streaming

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableMerge

/** STREAMING CHANGE-DATA-FEED SOURCE over a TableMerge table (VERDICT
  * r16 #6) — the Delta CDF / Iceberg incremental-changelog read as a
  * real Structured Streaming source: incremental consumers SUBSCRIBE
  * to a table's commits instead of re-diffing snapshots themselves
  * (`k11_change_feed` computes one such diff as a batch query; the
  * matview sink derives its own feed internally — this source makes
  * the feed a first-class input).
  *
  * Design: the source streams COMMIT METADATA, not rows — each emitted
  * record is one committed version pair `(base_version, version,
  * commit_seq)`, tiny and driver-derivable from the version directory
  * listing alone. The consumer expands a pair into the classified
  * row-level diff with [[ChangeFeed.diff]] (the same full-outer key
  * join + insert/delete/update/unchanged taxonomy as
  * `k11_change_feed`) inside `foreachBatch`, where the full engine is
  * available — a row-level diff is a JOIN, and a DSv2 scan partition
  * cannot express a shuffle, so pushing the diff INTO the source would
  * force a driver-side materialization; this split keeps the source
  * O(commits) and the diff fully distributed. Offsets are version
  * names (monotone: `v-<nanoTime>`), so restart resumes from the
  * checkpointed version and a replayed micro-batch re-emits the SAME
  * pairs — [[ChangeFeed.applyTo]] is idempotent per pair (upsert of
  * the same post-image + delete of the same keys), making the
  * end-to-end pipeline exactly-once without a batch-id protocol.
  *
  * Scale/retention contract: a pair is only expandable while BOTH its
  * versions are retained — consumers must keep their lag inside the
  * table's retention window (Delta CDF has the identical constraint).
  * A consumer that resumes AFTER retention expired its checkpointed
  * base fails LOUDLY ([[diff]]'s not-retained require aborts the
  * query; ChangeFeedSpec pins it) — never a silent skip, which would
  * drop the missed deltas from every downstream mirror. Recovery is
  * explicit: reset the checkpoint and re-bootstrap the mirror from the
  * oldest retained version's empty-base pair. The oldest retained
  * version pairs against the empty base `""` (a bootstrap micro-batch
  * classifying every row as an insert).
  */
object ChangeFeed {

  /** Source schema: one row per committed version transition. */
  val schema: StructType = StructType(Seq(
    StructField("base_version", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("version", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("commit_seq", org.apache.spark.sql.types.LongType, nullable = false)))

  /** Subscribe to a table's commit feed. */
  def readStream(spark: SparkSession, tablePath: String): DataFrame =
    spark.readStream.format(classOf[CdfSourceProvider].getName)
      .option("tablePath", tablePath).load()

  /** Committed versions OLDEST-first. */
  private[streaming] def ascending(tablePath: String): Seq[String] =
    TableMerge.versions(tablePath).reverse

  /** The classified row-level diff of one version pair — the
    * `k11_change_feed` taxonomy generalized over the table's schema:
    * full-outer join on `keys`, op = insert / delete / update /
    * unchanged (null-safe comparison over every non-key column), with
    * pre- and post-image columns (`pre_*` / `post_*`) and the commit
    * version riding each row. `baseVersion = None` diffs against the
    * empty table (the bootstrap pair). */
  def diff(spark: SparkSession, tablePath: String, baseVersion: Option[String],
           version: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "change-feed keys required")
    val post0 = TableMerge.readVersion(spark, tablePath, version)
    val pre0 = baseVersion.filter(_.nonEmpty)
      .map(TableMerge.readVersion(spark, tablePath, _))
      .getOrElse(post0.limit(0))
    val dataCols = post0.columns.toSeq.filterNot(keys.contains)
    // a pair can span a schema-evolution commit (ALTER ADD COLUMNS):
    // columns the pre snapshot lacks read as typed NULLs — exactly what
    // its rows would show after the evolution — so the diff classifies
    // a later backfill as `update`, not a crash
    def side(df: DataFrame, tag: String): DataFrame = {
      val have = df.columns.toSet
      val typed = post0.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(keys.map(col) ++ dataCols.map { c =>
        (if (have(c)) col(c) else lit(null).cast(typed(c))).as(s"${tag}_$c")
      } :+ lit(true).as(s"_${tag}_present"): _*)
    }
    val joined = side(pre0, "pre").join(side(post0, "post"), keys, "full_outer")
    val changed = dataCols.map(c => !(col(s"pre_$c") <=> col(s"post_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("op",
        when(col("_pre_present").isNull, lit("insert"))
          .when(col("_post_present").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .withColumn("commit_version", lit(version))
      .drop("_pre_present", "_post_present")
  }

  /** Apply one pair's diff to a downstream mirror table — the
    * subscriber's MERGE, as ONE copy-on-write commit: every changed
    * key (insert/update/delete) drops from the mirror and the
    * insert/update post-images re-insert — `replaceKeys` fuses both
    * halves, so a concurrent mirror reader only ever sees states the
    * SOURCE had (a separate upsert-then-delete pair exposed an
    * intermediate snapshot with new post-images beside keys already
    * deleted in the source — a state no source version ever held).
    * Idempotent: re-applying the same pair drops and re-inserts
    * identical rows. */
  def applyTo(spark: SparkSession, mirrorPath: String, feed: DataFrame,
              keys: Seq[String]): Unit = {
    val cols = feed.columns.filter(_.startsWith("post_")).map(c =>
      col(c).as(c.stripPrefix("post_"))).toSeq
    val upserts = feed.filter(col("op").isin("insert", "update"))
      .select(keys.map(col) ++ cols: _*)
    if (!TableMerge.exists(mirrorPath))
      TableMerge.createOrReplace(upserts, mirrorPath)
    else {
      val changedKeys = feed.filter(col("op").isin("insert", "update", "delete"))
        .select(keys.map(col): _*)
      TableMerge.replaceKeys(spark, mirrorPath, upserts, changedKeys, keys)
    }
  }
}

/** DSv2 provider for the commit-feed source; address the table dir via
  * `.option("tablePath", …)`. */
final class CdfSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdfTable(new CaseInsensitiveStringMap(properties).get("tablepath"))
}

private final class CdfTable(tablePath: String) extends Table with SupportsRead {
  require(tablePath != null && tablePath.nonEmpty,
    "graft CDF source requires .option(\"tablePath\", <table dir>)")
  override def name(): String = s"graft_cdf:$tablePath"
  override def schema(): StructType = ChangeFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChangeFeed.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdfStream(tablePath)
      }
    }
}

/** Offset = the newest version name consumed ("" = nothing yet). */
private final case class CdfOffset(version: String) extends Offset {
  override def json(): String = version
}

private final class CdfStream(tablePath: String) extends MicroBatchStream {
  private def seqOf(v: String): Long = v.stripPrefix("v-").toLong

  override def initialOffset(): Offset = CdfOffset("")
  override def latestOffset(): Offset =
    CdfOffset(ChangeFeed.ascending(tablePath).lastOption.getOrElse(""))
  override def deserializeOffset(json: String): Offset = CdfOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdfOffset].version
    val to = end.asInstanceOf[CdfOffset].version
    if (to.isEmpty) return Array.empty
    val all = ChangeFeed.ascending(tablePath)
    val window = all.filter(v =>
      (from.isEmpty || seqOf(v) > seqOf(from)) && seqOf(v) <= seqOf(to))
    val pairs = window.zip((if (from.isEmpty) "" else from) +: window.dropRight(1))
      .map { case (v, base) => (base, v, seqOf(v)) }
    if (pairs.isEmpty) Array.empty else Array(CdfPartition(pairs.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val pairs = partition.asInstanceOf[CdfPartition].pairs
      private var i = -1
      override def next(): Boolean = { i += 1; i < pairs.length }
      override def get(): InternalRow = {
        val (base, v, s) = pairs(i)
        InternalRow(UTF8String.fromString(base), UTF8String.fromString(v), s)
      }
      override def close(): Unit = ()
    }
}

private final case class CdfPartition(pairs: Array[(String, String, Long)])
  extends InputPartition
