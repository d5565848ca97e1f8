package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bloom-filter sketch pair — the semi-join-reduction primitive for
  * pipelines whose "small" side is too big to broadcast as an exact set
  * but fits as bits (benchmark decontamination at 100 TB: the union of
  * eval-suite shingles is tens of millions of 8-byte keys — hundreds of
  * MB as an exact broadcast set, a few MB at 10 bits/key as a Bloom):
  *
  *  - [[BloomFilterAgg]] (`graft_bloom_agg(key, numBits, numHashes)`)
  *    builds the sketch IN-PLAN as a [[TypedImperativeAggregate]]:
  *    per-partition partial bitmaps OR-merge associatively, so the
  *    build is one map-side pass plus a bitmap-sized reduce — no
  *    driver-side collect of keys, and because bit-OR commutes the
  *    emitted bytes are a pure function of the key SET (partitioning-
  *    independent, hash-pinnable).
  *  - [[BloomMightContain]] (`graft_bloom_contains(bloom, key)`)
  *    probes it as a codegen'd scalar — the corpus-side prefilter stays
  *    inside whole-stage codegen, and only survivors reach the shuffle
  *    for the exact confirm join. No false negatives, so
  *    prefilter + exact-confirm ≡ the plain exact join: the DuckDB
  *    oracle for a query using this pair is the ordinary join SQL, and
  *    a green hash proves the reduction is semantics-free.
  *
  * Bit placement is Kirsch–Mitzenmacher double hashing over a
  * splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
  * number generators"; the standard g_i(x) = h1(x) + i·h2(x) scheme):
  * k probe positions from two mixes of the key. Serialized layout:
  * 4-byte big-endian numBits, 4-byte numHashes, then ⌈numBits/64⌉
  * big-endian longs. Sizing rule of thumb: ~10 bits/key and k = 6
  * gives < 1% false positives; the FPR only costs wasted confirm work,
  * never correctness.
  */
object BloomSketch {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  def setBits(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L // odd: full-period stepping
    var h = h1
    var i = 0
    while (i < numHashes) {
      val bit = ((h & Long.MaxValue) % numBits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      h += h2
      i += 1
    }
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xFF); i += 1 }
    v
  }

  def pack(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](8 + words.length * 8)
    out(0) = (numBits >>> 24).toByte; out(1) = (numBits >>> 16).toByte
    out(2) = (numBits >>> 8).toByte; out(3) = numBits.toByte
    out(4) = (numHashes >>> 24).toByte; out(5) = (numHashes >>> 16).toByte
    out(6) = (numHashes >>> 8).toByte; out(7) = numHashes.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w)
      val off = 8 + w * 8
      var i = 0
      while (i < 8) { out(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
      w += 1
    }
    out
  }

  def unpack(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val numBits = readInt(bytes, 0)
    val numHashes = readInt(bytes, 4)
    val words = new Array[Long](numWords(numBits))
    var w = 0
    while (w < words.length) { words(w) = readLong(bytes, 8 + w * 8); w += 1 }
    (words, numBits, numHashes)
  }

  /** Codegen target: probe the packed sketch without unpacking it. */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    val numBits = readInt(bytes, 0)
    val numHashes = readInt(bytes, 4)
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var h = h1
    var i = 0
    while (i < numHashes) {
      val bit = ((h & Long.MaxValue) % numBits).toInt
      if ((readLong(bytes, 8 + ((bit >>> 6) << 3)) & (1L << (bit & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }
}

/** `graft_bloom_agg(key BIGINT, numBits, numHashes) -> BINARY` — the
  * in-plan Bloom build. The buffer is the raw bitmap; update sets k
  * bits, merge is word-wise OR (associative + commutative ⇒ map-side
  * partial aggregation works and the result is partitioning-
  * independent), eval packs to the serialized layout BloomMightContain
  * probes. NULL keys are skipped, matching how an exact semi-join
  * treats them (NULL never equi-joins).
  */
case class BloomFilterAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits > 0 && numBits <= (1 << 30),
    s"graft_bloom_agg: numBits must be in (0, 2^30], got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"graft_bloom_agg: numHashes must be in (0, 16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg needs a BIGINT key column, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomSketch.numWords(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.setBits(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomSketch.pack(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomSketch.pack(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomSketch.unpack(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(bloom BINARY, key BIGINT) -> BOOLEAN` — the
  * probe half: evaluates in-place over the packed sketch bytes (no
  * unpack per row) and generates a single static call, so a corpus
  * scan with this filter stays inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bloom_contains(bloom BINARY, key BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomSketch.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.expressions.BloomSketch.mightContain($bloom, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
