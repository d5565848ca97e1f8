package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: count of tokens within `maxEdits`
  * Levenshtein distance of `term` — the fuzzy term-frequency primitive
  * behind `search_bm25_fields` (the Spark-side equivalent of the
  * reference's ES `fuzziness: "AUTO"` match clause,
  * `airflow/src/chatbot_api.py:206`).
  *
  * Why native: the `filter(tokens, x -> levenshtein(x, t) <= e)`
  * higher-order composition is interpreted per element (lambda
  * evaluation + boxing per token, per term, per field — 9 combinations
  * in the BM25 query). This runs one tight loop per row: a length gate
  * (|len(x) - len(term)| > maxEdits can never match) and a
  * banded-early-exit edit-distance DP, inside whole-stage codegen via a
  * per-row method call.
  *
  * Null contract: null if the array is null; null ELEMENTS simply don't
  * count (matching the HOF filter, where a null lambda result drops the
  * element) — so the DuckDB oracle keeps its `list_filter` +
  * `levenshtein` form unchanged.
  */
final case class FuzzyTokenCount(child: Expression, term: String, maxEdits: Int)
  extends UnaryExpression {

  require(term != null && term.nonEmpty, "graft_fuzzy_tf term must be non-empty")
  require(maxEdits >= 0 && maxEdits <= 8, s"graft_fuzzy_tf maxEdits must be 0..8, got $maxEdits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fuzzy_tf requires an array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fuzzy_tf"

  private val termChars: Array[Char] = term.toCharArray

  /** Unit-cost Levenshtein ≤ maxEdits probe with the classic two-row DP
    * and per-row early exit when the whole band exceeds the budget.
    * Matches Spark's `levenshtein` / DuckDB's `levenshtein` semantics
    * (insert/delete/substitute, cost 1 each). */
  def withinEdits(token: UTF8String): Boolean = {
    if (token == null) return false
    val s = token.toString.toCharArray
    val t = termChars
    val dl = s.length - t.length
    if (dl > maxEdits || dl < -maxEdits) return false
    if (maxEdits == 0) return java.util.Arrays.equals(s, t)
    var prev = new Array[Int](t.length + 1)
    var curr = new Array[Int](t.length + 1)
    var j = 0
    while (j <= t.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= s.length) {
      curr(0) = i
      var rowMin = i
      j = 1
      while (j <= t.length) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        val v = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > maxEdits) return false // the band can only grow
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    prev(t.length) <= maxEdits
  }

  /** Per-row loop, called from both interpreted eval and generated code. */
  def countMatches(arr: ArrayData): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && withinEdits(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  override def nullSafeEval(a: Any): Any = countMatches(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row keeps the token loop in compiled Scala
    // while the surrounding projection stays in whole-stage codegen
    val ref = ctx.addReferenceObj("fuzzyTf", this, classOf[FuzzyTokenCount].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.countMatches($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyTokenCount =
    copy(child = newChild)
}
