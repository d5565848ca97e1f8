package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: IVF coarse-quantizer assignment — the
  * nearest (squared L2) of `nlist` deterministic grid centroids
  * c_j[i] = (((j·31 + i·17) mod 19) - 9)/10 for an
  * `ArrayType(Float|Double)` embedding. This is the partition-map
  * primitive behind `sim_ivf_assign`/`sim_ivf_topk` (the Spark-side
  * scale path generalizing the reference's ES kNN retrieval,
  * `airflow/src/chatbot_api.py:227-242`): at 100 TB the corpus is
  * written bucketed by this id and a query probes nprobe inverted
  * lists.
  *
  * Why native: the `transform(sequence(0, nlist-1), j -> aggregate(...))`
  * HOF composition is interpreted — nlist × dim lambda evaluations with
  * boxing per row. This runs ONE fused loop accumulating all nlist
  * squared distances per element. Per-centroid sums are bit-identical
  * to the per-centroid folds (independent accumulators, ascending-i
  * order), so the DuckDB oracle keeps its per-centroid `list_reduce`
  * form; ties resolve to the lowest centroid id, matching
  * `array_position(costs, array_min(costs)) - 1`.
  *
  * Null contract: null if the array is null or ANY element is null (a
  * null element nulls every per-centroid fold, making every cost NULL —
  * `array_min`/`array_position` then yield NULL in the HOF form).
  */
final case class IvfAssign(child: Expression, nlist: Int)
  extends UnaryExpression {

  require(nlist >= 1 && nlist <= 65536, s"graft_ivf_assign nlist must be 1..65536, got $nlist")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_assign requires an array<float|double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ivf_assign"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cost = new Array[Double](nlist)
    val xf = elemIsFloat
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      var j = 0
      while (j < nlist) {
        val d = xi - (((j * 31 + i * 17) % 19) - 9) / 10.0
        cost(j) += d * d
        j += 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < nlist) {
      if (cost(j) < cost(best)) best = j // strict < = lowest id on ties
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cost = ctx.freshName("cost")
      val xi = ctx.freshName("xi")
      val dd = ctx.freshName("dd")
      val best = ctx.freshName("best")
      s"""
         |final int $n = $x.numElements();
         |final double[] $cost = new double[$nlist];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final double $xi = (double) $x.$get($i);
         |    for (int $j = 0; $j < $nlist; $j++) {
         |      final double $dd = $xi - ((($j * 31 + $i * 17) % 19) - 9) / 10.0;
         |      $cost[$j] += $dd * $dd;
         |    }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int $best = 0;
         |  for (int $j = 1; $j < $nlist; $j++) {
         |    if ($cost[$j] < $cost[$best]) $best = $j;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}
