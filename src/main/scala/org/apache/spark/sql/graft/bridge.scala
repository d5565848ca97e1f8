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
                      stats: Map[String, Map[String, graft.operators.TableMerge.ColRange]]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.execution.datasources._
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.unsafe.types.UTF8String
    import graft.operators.TableMerge.{NumRange, StrRange}
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // NOTE: not File.toURI — for directories it appends a trailing
    // slash, and a Hadoop Path built from such a URI lists ZERO files
    val root = new org.apache.hadoop.fs.Path(
      "file:" + new java.io.File(liveDir).getAbsolutePath)
    val livePrefix = new java.io.File(liveDir).getAbsolutePath
    // pre-encode string bounds ONCE: the keep-test below runs per file
    // per planned read, and re-encoding UTF8Strings there would undo
    // the one-walk-per-column economy the bounds cache buys
    val strFileBounds: Map[(String, String), (UTF8String, UTF8String)] =
      stats.iterator.flatMap { case (rel, cols) =>
        cols.iterator.collect { case (c, graft.operators.TableMerge.StrRange(lo, hi)) =>
          (rel, c) -> ((UTF8String.fromString(lo), UTF8String.fromString(hi)))
        }
      }.toMap

    // A literal only narrows bounds when its TYPE matches the recorded
    // stat kind — the check is load-bearing, not cosmetic: stats are in
    // each column's own internal unit (kind `i` long value, `d` epoch
    // days, `t` epoch micros), so e.g. a TimestampType literal (micros)
    // must never compare against a legacy seconds-scale `i` row, and an
    // integral literal must never compare against date days. Mismatched
    // or unsupported comparisons keep the file.
    def litFor(kind: Char)(l: Literal): Option[Long] = {
      import org.apache.spark.sql.types._
      val typeMatches = kind match {
        case 'i' => l.dataType == ByteType || l.dataType == ShortType ||
          l.dataType == IntegerType || l.dataType == LongType
        case 'd' => l.dataType == DateType
        case 't' => l.dataType == TimestampType || l.dataType == TimestampNTZType
        case _ => false
      }
      if (!typeMatches) None
      else l.value match {
        case n: java.lang.Number => Some(n.longValue)
        case _ => None
      }
    }
    // String literals narrow only under the DEFAULT (UTF8_BINARY)
    // collation — the recorded ranges are UTF-8-binary min/max, and a
    // non-binary collation orders differently (collation-unsafe
    // comparisons keep the file).
    def litStr(l: Literal): Option[UTF8String] =
      if (l.dataType == org.apache.spark.sql.types.StringType) l.value match {
        case u: UTF8String => Some(u)
        case _ => None
      } else None

    /** Conjunct-intersected [lo, hi] the filters allow for `c`, under
      * a kind-checked literal extractor. */
    def boundsOf(filters: Seq[Expression], c: String,
                 lit: Literal => Option[Long]): (Long, Long) = {
      var lo = Long.MinValue; var hi = Long.MaxValue
      def visit(e: Expression): Unit = e match {
        case And(l, r) => visit(l); visit(r)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          lit(l).foreach(v => lo = math.max(lo, v))
        case GreaterThan(a: AttributeReference, l: Literal) if a.name == c =>
          lit(l).foreach(v => lo = math.max(lo, v + 1))
        case LessThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          lit(l).foreach(v => hi = math.min(hi, v))
        case LessThan(a: AttributeReference, l: Literal) if a.name == c =>
          lit(l).foreach(v => hi = math.min(hi, v - 1))
        case EqualTo(a: AttributeReference, l: Literal) if a.name == c =>
          lit(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          lit(l).foreach(v => hi = math.min(hi, v))
        case GreaterThan(l: Literal, a: AttributeReference) if a.name == c =>
          lit(l).foreach(v => hi = math.min(hi, v - 1))
        case LessThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          lit(l).foreach(v => lo = math.max(lo, v))
        case LessThan(l: Literal, a: AttributeReference) if a.name == c =>
          lit(l).foreach(v => lo = math.max(lo, v + 1))
        case EqualTo(l: Literal, a: AttributeReference) if a.name == c =>
          lit(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
        case _ => ()
      }
      filters.foreach(visit)
      (lo, hi)
    }

    /** Inclusive-widened UTF-8-binary string bounds for `c`: strict
      * inequalities widen to their inclusive form (there is no "+1" on
      * strings) — conservative, never prunes a boundary file wrongly. */
    def strBoundsOf(filters: Seq[Expression], c: String)
        : (Option[UTF8String], Option[UTF8String]) = {
      var lo: Option[UTF8String] = None
      var hi: Option[UTF8String] = None
      def tightenLo(v: UTF8String): Unit =
        if (lo.forall(_.binaryCompare(v) < 0)) lo = Some(v)
      def tightenHi(v: UTF8String): Unit =
        if (hi.forall(_.binaryCompare(v) > 0)) hi = Some(v)
      def visit(e: Expression): Unit = e match {
        case And(l, r) => visit(l); visit(r)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          litStr(l).foreach(tightenLo)
        case GreaterThan(a: AttributeReference, l: Literal) if a.name == c =>
          litStr(l).foreach(tightenLo)
        case LessThanOrEqual(a: AttributeReference, l: Literal) if a.name == c =>
          litStr(l).foreach(tightenHi)
        case LessThan(a: AttributeReference, l: Literal) if a.name == c =>
          litStr(l).foreach(tightenHi)
        case EqualTo(a: AttributeReference, l: Literal) if a.name == c =>
          litStr(l).foreach { v => tightenLo(v); tightenHi(v) }
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          litStr(l).foreach(tightenHi)
        case GreaterThan(l: Literal, a: AttributeReference) if a.name == c =>
          litStr(l).foreach(tightenHi)
        case LessThanOrEqual(l: Literal, a: AttributeReference) if a.name == c =>
          litStr(l).foreach(tightenLo)
        case LessThan(l: Literal, a: AttributeReference) if a.name == c =>
          litStr(l).foreach(tightenLo)
        case EqualTo(l: Literal, a: AttributeReference) if a.name == c =>
          litStr(l).foreach { v => tightenLo(v); tightenHi(v) }
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
          // bounds depend only on (filters, column, kind): one walk per
          // stats column per invocation, not per file (F files × C
          // columns would re-traverse the tree F·C times on big tables)
          val numBounds = scala.collection.mutable.Map[(String, Char), (Long, Long)]()
          val strBounds =
            scala.collection.mutable.Map[String, (Option[UTF8String], Option[UTF8String])]()
          base.map { pd =>
            pd.copy(files = pd.files.filter { f =>
              val rel = f.getPath.toUri.getPath
                .stripPrefix(livePrefix).stripPrefix("/")
              stats.get(rel) match {
                case None => true // no recorded range: must read
                case Some(colRanges) => colRanges.forall {
                  case (c, NumRange(kind, fLo, fHi)) =>
                    val (qLo, qHi) = numBounds.getOrElseUpdate((c, kind),
                      boundsOf(dataFilters, c, litFor(kind)))
                    fHi >= qLo && fLo <= qHi
                  case (c, _: StrRange) =>
                    val (qLo, qHi) = strBounds.getOrElseUpdate(c,
                      strBoundsOf(dataFilters, c))
                    val (fLo, fHi) = strFileBounds((rel, c))
                    qLo.forall(l => fHi.binaryCompare(l) >= 0) &&
                      qHi.forall(h => fLo.binaryCompare(h) <= 0)
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
