package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow `private[sql]` bridge for [[graft.plans.SqlMerge]]: a Column
  * view of a resolved Catalyst expression and a DataFrame view of a
  * logical plan — the two hooks a plan-level command executor needs to
  * hand analyzer-resolved expressions back to the public DataFrame
  * algebra. Nothing else from the internal API is re-exported.
  */
object bridge {
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Read a snapshot dir through a FileIndex that consults the graft
    * per-file range-stats sidecar during `listFiles`: files whose
    * recorded (col → min/max) range provably misses the pushed data
    * filters are dropped BEFORE any parquet footer is opened — the
    * automatic form of `TableMerge.readSkipping`, engaged by EVERY
    * read of a z-ordered table (SQL SELECT, DataFrame, MERGE source)
    * with zero caller opt-in. Extraction is conservative: only
    * top-level conjuncts of shape `col (=|<|<=|>|>=) literal` (either
    * orientation) and `col BETWEEN` narrow the range; anything else —
    * casts that survive Catalyst's unwrap rule, OR trees, UDFs —
    * leaves the file in the scan (correctness never depends on the
    * pruning; the planner's own partition pruning composes upstream).
    */
  def statsPrunedRead(spark: SparkSession, liveDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      stats: Map[String, Map[String, (Long, Long)]]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.execution.datasources._
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // NOTE: not File.toURI — for directories it appends a trailing
    // slash, and a Hadoop Path built from such a URI lists ZERO files
    val root = new org.apache.hadoop.fs.Path(
      "file:" + new java.io.File(liveDir).getAbsolutePath)
    val livePrefix = new java.io.File(liveDir).getAbsolutePath

    // Only INTEGRAL-typed literals narrow bounds. The dataType check is
    // load-bearing, not cosmetic: a TimestampType literal also holds a
    // java.lang.Long — but in MICROseconds, while zorder's stats are
    // `cast(col as long)` (epoch SECONDS for timestamps) — so accepting
    // it by value class would compare scales 1e6 apart and wrongly
    // prune every file. Non-integral comparisons keep the file.
    def litLong(l: Literal): Option[Long] = l.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        l.value match {
          case n: java.lang.Number => Some(n.longValue)
          case _ => None
        }
      case _ => None
    }
    /** Conjunct-intersected [lo, hi] the filters allow for `c`. */
    def boundsOf(filters: Seq[Expression], c: String): (Long, Long) = {
      var lo = Long.MinValue; var hi = Long.MaxValue
      def visit(e: Expression): Unit = e match {
        case And(l, r) => visit(l); visit(r)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          litLong(l).foreach(v => lo = math.max(lo, v))
        case GreaterThan(a: AttributeReference, l: Literal) if a.name == c =>
          litLong(l).foreach(v => lo = math.max(lo, v + 1))
        case LessThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          litLong(l).foreach(v => hi = math.min(hi, v))
        case LessThan(a: AttributeReference, l: Literal) if a.name == c =>
          litLong(l).foreach(v => hi = math.min(hi, v - 1))
        case EqualTo(a: AttributeReference, l: Literal) if a.name == c =>
          litLong(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          litLong(l).foreach(v => hi = math.min(hi, v))
        case GreaterThan(l: Literal, a: AttributeReference) if a.name == c =>
          litLong(l).foreach(v => hi = math.min(hi, v - 1))
        case LessThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          litLong(l).foreach(v => lo = math.max(lo, v))
        case LessThan(l: Literal, a: AttributeReference) if a.name == c =>
          litLong(l).foreach(v => lo = math.max(lo, v + 1))
        case EqualTo(l: Literal, a: AttributeReference) if a.name == c =>
          litLong(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
        case _ => ()
      }
      filters.foreach(visit)
      (lo, hi)
    }

    val index = new InMemoryFileIndex(cs, Seq(root),
      Map("basePath" -> root.toString), Some(schema)) {
      override def listFiles(partitionFilters: Seq[Expression],
                             dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
        val base = super.listFiles(partitionFilters, dataFilters)
        if (dataFilters.isEmpty) base
        else {
          // bounds depend only on (filters, column): one walk per stats
          // column per invocation, not per file (F files × C columns
          // would re-traverse the same tree F·C times on big tables)
          val qBounds: Map[String, (Long, Long)] =
            stats.valuesIterator.flatMap(_.keysIterator).toSet[String]
              .iterator.map(c => c -> boundsOf(dataFilters, c)).toMap
          base.map { pd =>
            pd.copy(files = pd.files.filter { f =>
              val rel = f.getPath.toUri.getPath
                .stripPrefix(livePrefix).stripPrefix("/")
              stats.get(rel) match {
                case None => true // no recorded range: must read
                case Some(colRanges) => colRanges.forall { case (c, (fLo, fHi)) =>
                  val (qLo, qHi) = qBounds(c)
                  fHi >= qLo && fLo <= qHi
                }
              }
            })
          }.filter(_.files.nonEmpty)
        }
      }
    }
    val partSchema = index.partitionSchema
    val dataSchema = org.apache.spark.sql.types.StructType(
      schema.filterNot(f => partSchema.exists(_.name == f.name)))
    val relation = HadoopFsRelation(index, partSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat, options = Map.empty)(cs)
    dataFrameOf(spark, LogicalRelation(relation))
  }
}
