package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator Catalyst extension (SURVEY §7.3 "custom Catalyst,
  * stretch"): per-key top-k via bounded heaps, swapped in by a planner
  * strategy wherever the DECLARATIVE pattern
  *
  *   `df.withColumn("rn", row_number().over(Window.partitionBy(keys)
  *      .orderBy(ord))).filter($"rn" <= k)`
  *
  * appears (W1 latest-wins is k=1, O3 subject top-5, …). Users keep
  * writing the idiomatic window; the strategy replaces the physical
  * full per-key SORT of WindowExec (O(n log n) per key, all rows
  * materialized per partition) with one streaming pass holding only
  * O(distinct-keys × k) rows. Same required clustering as the window —
  * the shuffle is unchanged, only the per-partition algorithm differs —
  * so plans upstream/downstream are untouched and results are identical
  * for total orderings (row_number ties are nondeterministic in BOTH
  * implementations unless the ordering is total).
  *
  * Memory bound: the heap map is O(distinct-keys × k). WindowExec's
  * sorter spills; so does this operator — when per-partition key
  * cardinality exceeds `spark.graft.topk.spillKeyThreshold` (default
  * 262144), the retained heaps are flushed to a key-sorted spill run on
  * local disk and the map restarts empty. Spilling is CORRECT because a
  * heap at flush time holds a superset of that key's contribution to the
  * global top-k from the rows seen so far: a true top-k row was either
  * retained, or evicted by k better same-key rows — impossible. The
  * final pass streams a k-way merge over the key-sorted runs, re-selects
  * top-k per key from ≤ runs×k candidates, and emits ranks; peak memory
  * is O(threshold × k + runs × k), never O(distinct-keys × k).
  */
object TopKPerKey {

  val SpillThresholdKey = "spark.graft.topk.spillKeyThreshold"

  /** Per-JVM spill-run diagnostic (executor-local on a cluster; exact in
    * local mode, where the spec uses it to prove the spill path ran). */
  val spillRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Physical operator: streaming bounded-heap top-k per key with
    * key-sorted spill runs past the key-cardinality threshold. */
  final case class TopKPerKeyExec(
      k: Int,
      partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      rnAttr: Attribute,
      child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output :+ rnAttr

    override def requiredChildDistribution: Seq[Distribution] =
      if (partitionSpec.isEmpty) AllTuples :: Nil
      else ClusteredDistribution(partitionSpec) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val partSpec = partitionSpec
      val ordSpec = orderSpec
      val childOutput = child.output
      val outAttrs = output
      val spillThreshold =
        math.max(1, conf.getConfString(SpillThresholdKey, "262144").toInt)
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(partSpec, childOutput)
        val ordering = RowOrdering.create(ordSpec, childOutput)
        // spill serializer for the (rare) child that emits non-Unsafe rows;
        // .copy() detaches the result from the projection's reused buffer
        lazy val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        def rowBytes(r: InternalRow): Array[Byte] = r match {
          case u: UnsafeRow => u.getBytes
          case other => toUnsafe(other).copy().getBytes
        }
        // max-heap by the sort order: the WORST retained row sits on top
        // and is evicted when a better one arrives
        val heaps = mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
        val runs = mutable.ArrayBuffer[File]()

        // spill under Spark's configured local dirs (the disks sized for
        // shuffle/spill), not java.io.tmpdir — /tmp is often a small or
        // RAM-backed root partition, the one place a spill must not go
        lazy val spillDir: File = {
          val base = Option(org.apache.spark.SparkEnv.get)
            .map(_.conf.get("spark.local.dir", System.getProperty("java.io.tmpdir")))
            .getOrElse(System.getProperty("java.io.tmpdir"))
            .split(",").head.trim
          val dir = new File(base)
          dir.mkdirs()
          dir
        }

        def flushToRun(): Unit = {
          if (heaps.isEmpty) return
          val file = File.createTempFile("graft-topk-spill", ".run", spillDir)
          Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
            file.delete(): Unit
          })
          val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
          try {
            // key-sorted entries make the final pass a streaming merge;
            // identical key values project to identical UnsafeRow bytes,
            // so unsigned-lexicographic byte order is consistent across runs
            val entries = heaps.toArray.map { case (key, heap) =>
              (key.getBytes, heap.toArray.map(rowBytes))
            }
            java.util.Arrays.sort(entries, (x: (Array[Byte], Array[Array[Byte]]),
                                            y: (Array[Byte], Array[Array[Byte]])) =>
              java.util.Arrays.compareUnsigned(x._1, y._1))
            entries.foreach { case (keyBytes, rowsBytes) =>
              out.writeInt(keyBytes.length)
              out.write(keyBytes)
              out.writeInt(rowsBytes.length)
              rowsBytes.foreach { rb => out.writeInt(rb.length); out.write(rb) }
            }
          } finally out.close()
          runs += file
          heaps.clear()
          spillRuns.incrementAndGet(): Unit
        }

        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              if (heaps.size >= spillThreshold) flushToRun()
              val h = new mutable.PriorityQueue[InternalRow]()(ordering)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) heap += row.copy()
          else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap += row.copy()
          }
        }

        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        def emit(ranked: Seq[InternalRow]): Iterator[InternalRow] =
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            resultProj(new JoinedRow(r, InternalRow(i + 1)))
          }

        if (runs.isEmpty) {
          heaps.iterator.flatMap { case (_, heap) =>
            emit(heap.dequeueAll.reverse) // ascending = rank order
          }
        } else {
          flushToRun() // the in-memory remainder becomes the last run
          val allCursors = runs.map(f => new RunCursor(f, childOutput.length))
          // a downstream limit can abandon the merge mid-stream; close
          // whatever is still open at task end (EOF closes eagerly)
          Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
            allCursors.foreach(_.close())
          })
          val cursors = allCursors.filter(_.advance())
          val byKey = new mutable.PriorityQueue[RunCursor]()(
            Ordering.comparatorToOrdering[RunCursor]((a, b) =>
              // reversed: scala PriorityQueue dequeues the max
              java.util.Arrays.compareUnsigned(b.keyBytes, a.keyBytes)))
          byKey ++= cursors
          new Iterator[Iterator[InternalRow]] {
            override def hasNext: Boolean = byKey.nonEmpty
            override def next(): Iterator[InternalRow] = {
              val first = byKey.dequeue()
              val candidates = mutable.ArrayBuffer[InternalRow](first.rows.toSeq: _*)
              val keyBytes = first.keyBytes
              if (first.advance()) byKey += first
              while (byKey.nonEmpty &&
                java.util.Arrays.compareUnsigned(byKey.head.keyBytes, keyBytes) == 0) {
                val c = byKey.dequeue()
                candidates ++= c.rows
                if (c.advance()) byKey += c
              }
              emit(candidates.sorted(ordering).take(kLocal).toSeq)
            }
          }.flatten
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  /** Streaming reader over one key-sorted spill run. */
  private final class RunCursor(file: File, rowFields: Int) {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file)))
    private var open = true
    var keyBytes: Array[Byte] = _
    var rows: Array[InternalRow] = _

    def close(): Unit = if (open) {
      open = false
      in.close()
      file.delete(): Unit
    }

    /** Load the next (key, candidate rows) entry; false at EOF (closes). */
    def advance(): Boolean =
      try {
        val keyLen = in.readInt()
        keyBytes = new Array[Byte](keyLen)
        in.readFully(keyBytes)
        val n = in.readInt()
        rows = Array.tabulate(n) { _ =>
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val row = new UnsafeRow(rowFields)
          row.pointTo(bytes, len)
          row
        }
        true
      } catch {
        case _: EOFException =>
          close()
          false
      }
  }

  /** Planner strategy: recognize Filter(rn ≤ k) over a single-expression
    * row_number window and plan the bounded-heap operator. Conservative:
    * only the exact shape (one window expression, rank-only predicate)
    * is rewritten; anything else falls through to the default planner. */
  object TopKPerKeyStrategy extends SparkStrategy {

    private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _, _)), _)), partSpec, ordSpec, child, _)) =>
        rankLimit(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 && ordSpec.nonEmpty =>
            TopKPerKeyExec(k, partSpec, ordSpec, alias.toAttribute, planLater(child)) :: Nil
          case _ => Nil
        }
      case _ => Nil
    }
  }

}
