package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate: top-`k` most frequent items per group via
  * the space-saving summary (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams") — the custom
  * [[TypedImperativeAggregate]] surface of the engine, complementing the
  * scalar-`Expression` (CosineSimilarity) and physical-operator
  * (TopKPerKey) extension points.
  *
  * The buffer holds at most `capacity` (item, count) entries; an unseen
  * item arriving at a full buffer evicts the minimum-count entry
  * (deterministic tie-break: smallest count, then lexicographically
  * smallest item) and inherits its count — the classic guarantee:
  * counts never undercount, overcount ≤ n/capacity per group, memory is
  * O(capacity) regardless of group size or distinct-item count. Buffers
  * merge associatively (map-side partial aggregation works; merged
  * error bounds add), and when a group's distinct items fit in
  * `capacity` the counts are EXACT — the battery query runs in that
  * regime so DuckDB can hash-verify it.
  *
  * Generalizes the reference's per-source diagnostic counts
  * (`gold_analytics.py` group-by count / order / limit shapes) into a
  * single-pass bounded-memory aggregate usable inside any groupBy.
  */
case class TopKFreq(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_freq needs a STRING item column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], item: String, cnt: Long): Unit =
    buf.get(item) match {
      case Some(c) => buf(item) = c + cnt
      case None if buf.size < capacity => buf(item) = cnt
      case None =>
        val (evictKey, evictCnt) = buf.minBy { case (s, c) => (c, s) }
        buf.remove(evictKey)
        buf(item) = evictCnt + cnt
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => add(buf, s, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toSeq
      .sortBy { case (s, c) => (-c, s) }
      .take(k)
      .map { case (s, c) => InternalRow(UTF8String.fromString(s), c) })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      // length-prefixed raw UTF-8, not writeUTF: items are arbitrary
      // column values and writeUTF caps at 65535 encoded bytes
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): TopKFreq =
    copy(child = newChild)
}
