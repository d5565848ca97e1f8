package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") — the
  * frequency member of the mergeable-sketch family ([[HllSketch]]
  * distincts, [[BloomSketch]] membership, TopKFreq heavy-hitters):
  * depth×width counters, each row d incrementing bucket
  * h_d(key) mod width; the point estimate min_d cnt[d][h_d(key)]
  * NEVER under-counts (every true occurrence lands in all d probed
  * cells) and over-counts only by collision mass — the one-sided
  * error contract the battery row pins.
  *
  * Hashing discipline: h_d(tok) is the repo's rolling codepoint
  * fingerprint ([[TextSketch.tokenFp]]) of `"{d}|{tok}"` — one hash
  * family, row-salted through the key prefix, bit-for-bit replayable
  * in DuckDB via the `duckFp` list_reduce fold, so the ENTIRE counter
  * table (not just the estimates) is oracle-pinnable.
  *
  * Scale posture: updates are per-row local, merge is element-wise sum
  * (associative + commutative ⇒ map-side partial aggregation, and the
  * emitted counters are a pure function of the input MULTISET —
  * partitioning-independent, hash-pinnable); the buffer is
  * depth×width longs (4×256 = 8 KiB here) regardless of corpus size,
  * so a 100 TB scan reduces to one such array per partition.
  */
object CmsSketch {

  /** The row-salted hash: rolling fingerprint of "{d}|{tok}" mod width.
    * Reference semantics; the aggregate hot path uses [[prefixAccs]] +
    * [[foldFrom]] to decode the token once per row instead of once per
    * depth row. */
  def bucket(d: Int, tok: UTF8String, width: Int): Int = {
    val s = d.toString + "|" + tok.toString
    var acc = 7L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % TextSketch.P
      i += Character.charCount(cp)
    }
    (acc % width).toInt
  }

  /** Per-depth seed: the fold of "{d}|"'s codepoints from 7 — hoisted
    * so update() folds only the token per depth row. */
  def prefixAccs(depth: Int): Array[Long] =
    Array.tabulate(depth) { d =>
      val s = d.toString + "|"
      var acc = 7L
      var i = 0
      while (i < s.length) {
        acc = (acc * 31 + s.charAt(i)) % TextSketch.P
        i += 1
      }
      acc
    }

  /** Continue the rolling fold over pre-decoded codepoints. */
  def foldFrom(seed: Long, cps: Array[Int]): Long = {
    var acc = seed
    var i = 0
    while (i < cps.length) {
      acc = (acc * 31 + cps(i)) % TextSketch.P
      i += 1
    }
    acc
  }
}

/** `graft_cms_agg(tok STRING, depth, width) -> ARRAY<BIGINT>` — builds
  * the depth×width counter table in-plan; row d occupies elements
  * [d·width, (d+1)·width). NULL tokens are skipped (they'd never
  * equi-join either). Estimates read the array with `element_at`
  * (1-indexed) + `least`, staying inside whole-stage codegen.
  */
case class CmsAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16,
    s"graft_cms_agg: depth must be in (0, 16], got $depth")
  require(width > 0 && width <= (1 << 20),
    s"graft_cms_agg: width must be in (0, 2^20], got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_agg needs a STRING token column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // Hoisted "{d}|" hash seeds: update() decodes the token's codepoints
  // ONCE and folds the pre-decoded array per depth row, instead of
  // building + re-decoding a "{d}|{tok}" String depth times per input.
  @transient private lazy val prefixAcc: Array[Long] = CmsSketch.prefixAccs(depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
      var d = 0
      while (d < depth) {
        buf(d * width + (CmsSketch.foldFrom(prefixAcc(d), cps) % width).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    var w = 0
    while (w < buf.length) {
      val v = buf(w)
      var i = 0
      while (i < 8) { out(w * 8 + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
      w += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var w = 0
    while (w < buf.length) {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(w * 8 + i) & 0xFF); i += 1 }
      buf(w) = v
      w += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}
