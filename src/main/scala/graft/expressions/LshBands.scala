package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: banded sign-random-projection LSH
  * signature over an `ArrayType(Float|Double)` embedding — the ANN
  * bucketing primitive behind `sim_lsh_buckets` / `sim_embed_neardup`
  * (the Spark-side generalization of the reference's ES kNN retrieval,
  * `airflow/src/chatbot_api.py:227-242`).
  *
  * Returns `array<int>` of `nBands` band signatures; band `g`'s bit `j`
  * is set iff the projection onto deterministic integer hyperplane
  * `b = g*bandBits + j` is ≥ 0, with `w(b, i) = ((b*37 + i*13) % 21) - 10`.
  * All `nBands × bandBits` projections accumulate in ONE fused loop over
  * the embedding — the `aggregate()` higher-order-function composition
  * this replaces is interpreted per element and re-reads the array once
  * per bit (16 bits × 64 elements of boxed lambda evaluation per row;
  * measured 5.0 s → sub-second for the near-dup battery query at sf0.1).
  * Per-bit sums are bit-for-bit identical to the per-bit folds (each
  * accumulator is independent and sums in the same ascending-i order),
  * so the DuckDB oracle keeps its per-bit `list_reduce` form.
  *
  * Scale posture: the signature is the shuffle/partition key of every
  * LSH candidate join; `bandBits` must grow with log2(corpus) to hold
  * per-bucket occupancy constant (8 bits ≈ 10^5 vectors, ~26 bits for a
  * 100 TB corpus), and `nBands` buys recall — a near-dup pair need only
  * agree on one band.
  *
  * Null contract: null if the array is null; a null ELEMENT yields
  * signature 0 for every band — matching the CASE-wrapped HOF form this
  * replaces (and the DuckDB oracle, which keeps it): a null element
  * nulls every bit's fold, `CASE WHEN NULL >= 0` takes the ELSE 0 arm,
  * and all bits come out 0.
  */
final case class LshBands(child: Expression, nBands: Int, bandBits: Int)
  extends UnaryExpression {

  require(nBands >= 1 && bandBits >= 1 && bandBits <= 30,
    s"graft_lsh_bands needs 1 <= bands and 1 <= bandBits <= 30, got ($nBands, $bandBits)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands requires an array<float|double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bands"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def weight(b: Int, i: Int): Int = ((b * 37 + i * 13) % 21) - 10

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val nb = nBands * bandBits
    val proj = new Array[Double](nb)
    val xf = elemIsFloat
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return new GenericArrayData(new Array[Int](nBands))
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      var b = 0
      while (b < nb) {
        proj(b) += xi * weight(b, i)
        b += 1
      }
      i += 1
    }
    val out = new Array[Int](nBands)
    var g = 0
    while (g < nBands) {
      var sig = 0
      var j = 0
      while (j < bandBits) {
        if (proj(g * bandBits + j) >= 0.0) sig |= (1 << j)
        j += 1
      }
      out(g) = sig
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val nb = nBands * bandBits
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val out = ctx.freshName("out")
      val xi = ctx.freshName("xi")
      val sig = ctx.freshName("sig")
      val nullElem = ctx.freshName("nullElem")
      s"""
         |final int $n = $x.numElements();
         |final double[] $proj = new double[$nb];
         |boolean $nullElem = false;
         |for (int $i = 0; $i < $n && !$nullElem; $i++) {
         |  if ($x.isNullAt($i)) {
         |    $nullElem = true;
         |  } else {
         |    final double $xi = (double) $x.$get($i);
         |    for (int $b = 0; $b < $nb; $b++) {
         |      $proj[$b] += $xi * ((($b * 37 + $i * 13) % 21) - 10);
         |    }
         |  }
         |}
         |final int[] $out = new int[$nBands];
         |if (!$nullElem) {
         |  for (int $g = 0; $g < $nBands; $g++) {
         |    int $sig = 0;
         |    for (int $j = 0; $j < $bandBits; $j++) {
         |      if ($proj[$g * $bandBits + $j] >= 0.0) $sig |= (1 << $j);
         |    }
         |    $out[$g] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}
