package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the text-sketch expression family
  * ([[WordFps]] / [[ShingleSet]] / [[MinhashSig]] / [[SimhashBits]] /
  * [[ShingleHash64]]) — static methods so each expression's `doGenCode`
  * is a single call that keeps the enclosing projection inside
  * whole-stage codegen (the `StaticInvoke` shape) instead of a page of
  * templated Java per operator.
  *
  * These replace the interpreted higher-order-function compositions the
  * dedup battery shipped through r5 — `transform(tokens, w ->
  * aggregate(split(w, ''), 7, (acc, c) -> (acc*31+ascii(c)) % P))` et
  * al. — which evaluate a boxed lambda per character per row and are
  * CodegenFallback. The arithmetic is IDENTICAL (same fold order, same
  * mod-P grid), so the established DuckDB oracle forms
  * (`PipelineQueries.duckFp`, the per-perm `list_min` folds) need no
  * change; TextSketchSpec pins native == HOF bitwise on edge cases.
  */
object TextSketch {

  /** 31-bit Mersenne prime — keeps `a*x+b` products inside 2^52 so the
    * same values are exactly representable in DuckDB's arithmetic. */
  val P: Long = 2147483647L

  /** Rolling codepoint hash of one token: fold (acc*31 + cp) % P from
    * acc=7 — exactly `aggregate(split(w, ''), 7, (acc, c) -> (acc*31 +
    * ascii(c)) % P)`: Spark's `split(w, '')` yields one codepoint per
    * element (regex split is codepoint-aware) and `ascii` returns the
    * first codepoint. */
  def tokenFp(w: UTF8String): Long = {
    val s = w.toString
    var acc = 7L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Per-token fingerprints; a null token yields a null element (the
    * HOF transform propagates null the same way). */
  def wordFps(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (tokens.isNullAt(i)) null
      else java.lang.Long.valueOf(tokenFp(tokens.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 3-gram shingle fps in first-occurrence order:
    * sh_i = (fp_i*961 + fp_{i+1}*31 + fp_{i+2}) % P — exactly
    * `array_distinct(transform(sequence(1, n-2), i -> ...))` for n >= 3
    * (callers filter `size(tokens) >= 3` first; n < 3 yields an empty
    * set). A null fp nulls its windows' shingles; distinct keeps one
    * null like `array_distinct`. */
  def shingleSet(fps: ArrayData): ArrayData = {
    val n = fps.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i + 2 < n) {
      val v =
        if (fps.isNullAt(i) || fps.isNullAt(i + 1) || fps.isNullAt(i + 2)) null
        else java.lang.Long.valueOf(
          (fps.getLong(i) * 961 + fps.getLong(i + 1) * 31 + fps.getLong(i + 2)) % P)
      seen.add(v)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** k-permutation minhash signature: out(j) = min over non-null x of
    * (a_j*x + b_j) % P — exactly `array_min(transform(arr, x -> (a*x+b)
    * % P))` per permutation (array_min skips null elements; an empty or
    * all-null input yields null per permutation). One pass over the
    * array for all k accumulators; each accumulator is independent, so
    * values are bit-identical to the per-perm folds the oracle keeps. */
  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = (as(j) * x + bs(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (mins(j) == Long.MaxValue) null else java.lang.Long.valueOf(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** nBits-bit SimHash over per-word fps: bit b is set iff the +1/-1
    * vote sum of `((fp*(2b+3) + b*7919) % 65537) % 2 == 1` is positive —
    * exactly the per-bit `aggregate(...)` folds (same vote formula,
    * same ascending order; sums are order-independent anyway). A null
    * element nulls every fold, so the result is null (the CASE-wrapped
    * HOF form yields 0 per bit only when wrapped; the raw form is null
    * — callers treat null input rows upstream). */
  def simhashBits(fps: ArrayData, nBits: Int): Any = {
    val votes = new Array[Int](nBits)
    val n = fps.numElements()
    var i = 0
    while (i < n) {
      if (fps.isNullAt(i)) return null
      val f = fps.getLong(i)
      var b = 0
      while (b < nBits) {
        val parity = ((f * (2 * b + 3) + b * 7919L) % 65537L) % 2L
        votes(b) += (if (parity == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** Fused stopword/length census of a token array — one pass replacing
    * the two CodegenFallback HOFs the quality/langid queries shipped
    * through r8 (`size(filter(tokens, t -> t IN (...)))` +
    * `aggregate(tokens, 0L, (a, w) -> a + length(w))`): out(0) =
    * stopword hits (a null token is dropped by `filter`, matching `t IN
    * (...)` null semantics), out(1) = total codepoint length (null if
    * ANY token is null — `a + length(null)` poisons the whole
    * aggregate fold). Lengths count codepoints via UTF8String.numChars,
    * exactly Spark's `length`. */
  def stopwordStats(tokens: ArrayData, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = tokens.numElements()
    var hits = 0L
    var totalLen = 0L
    var lenNull = false
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) lenNull = true
      else {
        val t = tokens.getUTF8String(i)
        if (stop.contains(t)) hits += 1
        totalLen += t.numChars()
      }
      i += 1
    }
    new GenericArrayData(Array[Any](
      java.lang.Long.valueOf(hits),
      if (lenNull) null else java.lang.Long.valueOf(totalLen)))
  }

  /** Distinct 64-bit 3-shingle hashes of raw tokens, FNV-1a over the
    * codepoints of the three words joined by a single space — a JOIN
    * KEY, not an oracle value: the DuckDB side of the Jaccard queries
    * joins on the string shingles themselves, so any collision-safe
    * 64-bit hash works here (replaces `xxhash64(concat_ws(' ', w1, w2,
    * w3))` inside an interpreted transform; ~1e-15 in-pair collision
    * odds at per-doc shingle counts, far below the oracle float grid).
    * Null tokens make their windows' shingles null (kept once). */
  def shingleHash64(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val FnvPrime = 1099511628211L
    val hashes = new Array[Long](n)
    val nulls = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) nulls(i) = true
      else {
        val s = tokens.getUTF8String(i).toString
        var h = -3750763034362895579L // FNV-1a offset basis
        var j = 0
        val m = s.length
        while (j < m) {
          val cp = s.codePointAt(j)
          h = (h ^ cp) * FnvPrime
          j += Character.charCount(cp)
        }
        hashes(i) = h
      }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Any]()
    i = 0
    while (i + 2 < n) {
      val v =
        if (nulls(i) || nulls(i + 1) || nulls(i + 2)) null
        else {
          // combine the three word hashes + the separator, FNV-style
          var h = (hashes(i) ^ 32L) * FnvPrime
          h = (h ^ hashes(i + 1)) * FnvPrime
          h = (h ^ 32L) * FnvPrime
          h = (h ^ hashes(i + 2)) * FnvPrime
          java.lang.Long.valueOf(h)
        }
      seen.add(v)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** POSITIONAL k-gram ROLLING FINGERPRINTS: element i is
    * [[tokenFp]] of `concat_ws(' ', tokens[i..i+k-1])` — bit-identical
    * to the `transform(sequence(...), i -> graft_str_fp(concat_ws(' ',
    * slice(tokens, i, k))))` HOF the winnow family previously inlined
    * (PipelineShared.winnowHashesExpr), including concat_ws's
    * null-SKIPPING semantics (a null token contributes neither chars
    * nor a separator; an all-null window folds the empty string → 7).
    * The win is allocation-free evaluation: codepoints decode once per
    * token into int arrays and each window folds ints, instead of per-
    * position array slices + string building (measured 6.5 s → sub-
    * second on the sf0.1 APSS posting build). DuckDB replays the same
    * values via the duckWinnowHashes list_reduce fold, so every
    * winnow-family oracle hash is unchanged. */
  def shingleFps(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val cps = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i).toString
        val buf = new Array[Int](s.length)
        var j = 0
        var m = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          buf(m) = cp
          m += 1
          j += Character.charCount(cp)
        }
        cps(i) = java.util.Arrays.copyOf(buf, m)
      }
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i + k - 1 < n) {
      var acc = 7L
      var first = true
      var j = i
      while (j < i + k) {
        val c = cps(j)
        if (c != null) { // null tokens: concat_ws skips them entirely
          if (!first) acc = (acc * 31 + 32L) % P // the ' ' separator
          first = false
          var p = 0
          while (p < c.length) {
            acc = (acc * 31 + c(p)) % P
            p += 1
          }
        }
        j += 1
      }
      out(i) = java.lang.Long.valueOf(acc)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** POSITIONAL k-gram hashes: one FNV-1a word-window hash per start
    * position (array length n-k+1, NO dedup — position i covers tokens
    * [i, i+k-1]). The span-coverage dedup needs every occurrence with
    * its offset, unlike [[shingleHash64]]'s distinct join keys; same
    * hash construction (per-word FNV then window combine with the
    * space separator), so it is likewise a JOIN/GROUP key, not an
    * oracle value — the DuckDB side groups on the string k-grams
    * themselves. Windows containing a null token hash to null. */
  def shingleHashesK(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val FnvPrime = 1099511628211L
    val hashes = new Array[Long](n)
    val nulls = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) nulls(i) = true
      else {
        val s = tokens.getUTF8String(i).toString
        var h = -3750763034362895579L // FNV-1a offset basis
        var j = 0
        val m = s.length
        while (j < m) {
          val cp = s.codePointAt(j)
          h = (h ^ cp) * FnvPrime
          j += Character.charCount(cp)
        }
        hashes(i) = h
      }
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i + k - 1 < n) {
      var hasNull = false
      var h = -3750763034362895579L
      var j = i
      while (j < i + k) {
        if (nulls(j)) hasNull = true
        else {
          if (j > i) h = (h ^ 32L) * FnvPrime
          h = (h ^ hashes(j)) * FnvPrime
        }
        j += 1
      }
      out(i) = if (hasNull) null else java.lang.Long.valueOf(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_str_fp(string)` → `long`: the scalar rolling codepoint
  * fingerprint — same fold as one [[WordFps]] element, exposed for
  * whole-string uses (document fingerprinting F12, deterministic
  * train/val/test assignment). DuckDB replicates it with the
  * `list_reduce` fold (`PipelineQueries.duckFp`). */
final case class StringFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_str_fp requires a string, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_str_fp"
  override def nullSafeEval(a: Any): Any =
    TextSketch.tokenFp(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.tokenFp($x);")
  override protected def withNewChildInternal(newChild: Expression): StringFp =
    copy(child = newChild)
}

/** `graft_word_fps(array<string>)` → `array<long>`: per-token rolling
  * codepoint fingerprints (the dedup battery's shared word-hash,
  * reference shingling analogue `silver/transformer.py` content
  * fingerprints). */
final case class WordFps(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_fps requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_fps"
  override def nullSafeEval(a: Any): Any = TextSketch.wordFps(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.wordFps($x);")
  override protected def withNewChildInternal(newChild: Expression): WordFps =
    copy(child = newChild)
}

/** `graft_shingle_set(array<long>)` → `array<long>`: distinct mod-P
  * 3-gram shingles over word fps (first-occurrence order). */
final case class ShingleSet(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_set requires array<long>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set"
  override def nullSafeEval(a: Any): Any = TextSketch.shingleSet(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.shingleSet($x);")
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** `graft_minhash(array<long>, 'a1,b1;a2,b2;…')` → `array<long>`: the
  * k-permutation minhash signature in one array pass. */
final case class MinhashSig(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "graft_minhash needs >= 1 (a,b) pair")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<long>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"
  @transient private lazy val asArr = as
  @transient private lazy val bsArr = bs
  override def nullSafeEval(a: Any): Any =
    TextSketch.minhashSig(a.asInstanceOf[ArrayData], asArr, bsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.minhashSig($x, $asRef, $bsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `graft_simhash(array<long>, nBits)` → `long`: vote-fold SimHash over
  * word fps, all bit-planes in one pass. */
final case class SimhashBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 62, s"graft_simhash needs 1 <= nBits <= 62, got $nBits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<long>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(a: Any): Any =
    TextSketch.simhashBits(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("simhashRes")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |Object $res = graft.expressions.TextSketch.simhashBits($x, $nBits);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $res).longValue(); }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** `graft_stopword_stats(array<string>, 'w1,w2,…')` → `array<long>`
  * [stopword_hits, total_codepoint_len]: the text-quality/langid census
  * in one codegen'd pass (VERDICT r8 #8 — the lambda-HOF forms are
  * CodegenFallback and break the scan's whole-stage span). The DuckDB
  * oracles keep their list_filter/list_reduce forms; TextSketchSpec
  * pins native == HOF bitwise. */
final case class StopwordStats(child: Expression, stopwords: Array[String])
  extends UnaryExpression {
  require(stopwords.nonEmpty, "graft_stopword_stats needs >= 1 stopword")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_stats requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_stopword_stats"
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def nullSafeEval(a: Any): Any =
    TextSketch.stopwordStats(a.asInstanceOf[ArrayData], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.stopwordStats($x, $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordStats =
    copy(child = newChild)
}

/** `graft_shingle_hash64(array<string>)` → `array<long>`: distinct
  * 64-bit 3-shingle join keys (FNV-1a over words + separator). */
final case class ShingleHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash64 requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hash64"
  override def nullSafeEval(a: Any): Any =
    TextSketch.shingleHash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.shingleHash64($x);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

/** `graft_shingle_hashes(array<string>, k)` → `array<long>`: positional
  * (non-deduped) k-gram window hashes — element i is the 64-bit key of
  * tokens [i, i+k-1]; length n-k+1. Feeds the duplicated-span coverage
  * operator, which needs offsets to merge overlapping windows. */
/** `graft_shingle_fps(tokens, k)` → `array<long>`: positional k-gram
  * rolling fingerprints (see [[TextSketch.shingleFps]]) — the native
  * kernel behind `PipelineShared.winnowHashesExpr`. */
final case class ShingleFpsK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"graft_shingle_fps needs k >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_fps requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_fps"
  override def nullSafeEval(a: Any): Any =
    TextSketch.shingleFps(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.shingleFps($x, $k);")
  override protected def withNewChildInternal(newChild: Expression): ShingleFpsK =
    copy(child = newChild)
}

final case class ShingleHashesK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"graft_shingle_hashes needs k >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"
  override def nullSafeEval(a: Any): Any =
    TextSketch.shingleHashesK(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSketch.shingleHashesK($x, $k);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesK =
    copy(child = newChild)
}
