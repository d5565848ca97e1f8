package graft.plans

import scala.collection.mutable

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
  */
object TopKPerKey {

  /** Physical operator: streaming bounded-heap top-k per key. */
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
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(partSpec, childOutput)
        val ordering = RowOrdering.create(ordSpec, childOutput)
        // max-heap by the sort order: the WORST retained row sits on top
        // and is evicted when a better one arrives
        val heaps = mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
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
        heaps.iterator.flatMap { case (_, heap) =>
          val ranked = heap.dequeueAll.reverse // ascending = rank order
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            resultProj(new JoinedRow(r, InternalRow(i + 1)))
          }
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
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
