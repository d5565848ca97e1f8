package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-centroid assignment of an e6
  * integer vector against an ARBITRARY codebook —
  * `graft_argmin_sq(vec ARRAY<BIGINT>, cents ARRAY<ARRAY<BIGINT>>)` →
  * `STRUCT<centroid_id INT, dist BIGINT>`, where `dist` is the squared
  * L2 distance to the winning row and ties resolve to the lowest index.
  * This is the trained-quantizer twin of [[IvfAssign]] (whose centroids
  * are a closed-form grid): Lloyd's k-means assignment, PQ sub-codebook
  * routing, and the retrain lifecycle's re-assignment all reduce to it.
  *
  * Why native: the HOF spelling — `transform(cents, c ->
  * aggregate(zip_with(vec, c, …), 0L, …))` + `array_min` +
  * `array_position` — allocates a zipped array and an interpreted
  * lambda frame per centroid per row; at the derived quantizer widths
  * (k = √N) that is k·dim boxed ops per row and dominated the retrain
  * pass (r17 probe: 56 s at ×32/k=128). This runs ONE fused integer
  * loop, no allocation beyond the 2-field result row, inside
  * whole-stage codegen. Integer math ⇒ bit-identical to the HOF form
  * (same sums, same strict-< lowest-index tie-break; ArgminSqSpec
  * equates them).
  *
  * Null contract (matching the HOF composition): null if either array
  * is null, the codebook is empty, any element of `vec` or of a
  * codebook row is null, or any codebook row's length differs from
  * `vec`'s (zip_with would pad with null, nulling that fold).
  */
final case class ArgminSq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_sq requires (array<bigint>, array<array<bigint>>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val k = cents.numElements()
    if (k == 0) return null
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return null; i += 1 }
    var best = -1
    var bestD = Long.MaxValue
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) return null
      val c = cents.getArray(j)
      if (c.numElements() != n) return null
      var d = 0L
      var t = 0
      while (t < n) {
        if (c.isNullAt(t)) return null
        val diff = vec.getLong(t) - c.getLong(t)
        d += diff * diff
        t += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](best, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |final int $n = $vec.numElements();
         |final int $k = $cents.numElements();
         |if ($k == 0) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($vec.isNullAt($i)) ${ev.isNull} = true;
         |}
         |int $best = -1;
         |long $bestD = Long.MAX_VALUE;
         |for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |  if ($cents.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($j);
         |  if ($c.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $d = 0L;
         |  for (int $t = 0; $t < $n; $t++) {
         |    if ($c.isNullAt($t)) { ${ev.isNull} = true; break; }
         |    final long $diff = $vec.getLong($t) - $c.getLong($t);
         |    $d += $diff * $diff;
         |  }
         |  if (!${ev.isNull} && $d < $bestD) { $bestD = $d; $best = $j; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Integer.valueOf($best), java.lang.Long.valueOf($bestD)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminSq =
    copy(left = newLeft, right = newRight)
}
