package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native graft_lsh_bands expression: per-bit sums must match the
  * per-bit aggregate() HOF folds bitwise (independent accumulators,
  * same ascending-element order), null contract, literal-argument
  * validation, and interpreted-vs-codegen agreement.
  */
class LshBandsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** The HOF per-bit fold the oracle uses, for global bit b. */
  private def hofBit(b: Int, weightInBand: Int): String =
    s"(CASE WHEN aggregate(sequence(0, size(v) - 1), CAST(0.0 AS DOUBLE), " +
      s"(a, i) -> a + CAST(element_at(v, i + 1) AS DOUBLE) * " +
      s"CAST((($b * 37 + i * 13) % 21) - 10 AS DOUBLE)) >= 0 " +
      s"THEN $weightInBand ELSE 0 END)"

  test("matches the per-bit HOF folds for 2 bands x 8 bits") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = Seq.fill(40)(Seq.fill(64)(rng.nextFloat() - 0.5f))
    val df = rows.toDF("v")
    val bandExprs = (0 until 2).map { g =>
      (0 until 8).map(j => hofBit(g * 8 + j, 1 << j)).mkString("(", " + ", ")")
    }
    val got = df.select(
      expr("graft_lsh_bands(v, 2, 8)").as("native"),
      expr(s"array(${bandExprs.mkString(", ")})").as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("single 8-bit band equals the sim_lsh_buckets signature shape") {
    val r = spark.sql(
      "SELECT graft_lsh_bands(array_repeat(CAST(0.1 AS DOUBLE), 64), 1, 8) AS s").head()
    val sig = r.getSeq[Int](0)
    assert(sig.length == 1 && sig.head >= 0 && sig.head < 256)
  }

  test("null contract: null array is null; null element is all-zero sigs (oracle CASE-fold)") {
    val r = spark.sql(
      "SELECT graft_lsh_bands(CAST(NULL AS ARRAY<DOUBLE>), 2, 8) AS a, " +
        "graft_lsh_bands(array(1.0D, CAST(NULL AS DOUBLE)), 2, 8) AS b").head()
    assert(r.isNullAt(0))
    // matches CASE WHEN <null fold> >= 0 THEN bit ELSE 0: every bit 0
    assert(r.getSeq[Int](1) == Seq(0, 0))
    // NULL band-count literal gets a clear error, not an unboxed 0
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bands(array(1.0D), CAST(NULL AS INT), 8)").head()
    }
    assert(e.getMessage.contains("must not be NULL"))
  }

  test("rejects non-literal band arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bands(array(1.0D), CAST(rand() * 2 AS INT), 8)").head()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("interpreted eval matches codegen") {
    // nullSafeEval path (used by the interpreter / constant folding)
    // must agree with the generated code on the same input
    val sigSql = "graft_lsh_bands(array_repeat(CAST(-0.3 AS DOUBLE), 64), 3, 5)"
    val viaProjection = spark.sql(s"SELECT $sigSql AS s").head().getSeq[Int](0)
    import graft.expressions.LshBands
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = Literal.create(new GenericArrayData(Array.fill(64)(-0.3)), ArrayType(DoubleType))
    val interpreted = LshBands(lit, 3, 5).eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    assert(viaProjection == interpreted)
  }
}
