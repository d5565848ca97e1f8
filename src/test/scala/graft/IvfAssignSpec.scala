package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native graft_ivf_assign: per-centroid sums must match the per-centroid
  * HOF folds (the oracle's form) bitwise, ties resolve to the lowest
  * centroid id, and the null contract mirrors array_min/array_position
  * over a null-poisoned costs array.
  */
class IvfAssignSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val hofAssign =
    "CAST(array_position(costs, array_min(costs)) - 1 AS INT)"
  private val hofCosts =
    "transform(sequence(0, 15), j -> aggregate(sequence(0, size(v) - 1), CAST(0.0 AS DOUBLE), " +
      "(acc, i) -> acc + (CAST(element_at(v, i + 1) AS DOUBLE) - " +
      "CAST(((j * 31 + i * 17) % 19) - 9 AS DOUBLE) / 10.0D) * " +
      "(CAST(element_at(v, i + 1) AS DOUBLE) - " +
      "CAST(((j * 31 + i * 17) % 19) - 9 AS DOUBLE) / 10.0D)))"

  test("matches the HOF cost-fold argmin on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = Seq.fill(40)(Seq.fill(64)(rng.nextFloat() * 2 - 1))
    val got = rows.toDF("v")
      .selectExpr("graft_ivf_assign(v, 16) AS native",
        s"$hofCosts AS costs")
      .selectExpr("native", s"$hofAssign AS hof")
      .as[(Int, Int)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("null contract and literal validation") {
    val r = spark.sql(
      "SELECT graft_ivf_assign(CAST(NULL AS ARRAY<DOUBLE>), 16) AS a, " +
        "graft_ivf_assign(array(1.0D, CAST(NULL AS DOUBLE)), 16) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ivf_assign(array(1.0D), CAST(rand() * 4 AS INT))").head()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("tie resolves to the lowest centroid id") {
    // the zero vector is equidistant from symmetric centroids; argmin
    // must take the first minimum like array_position does
    val n = spark.sql(
      "SELECT graft_ivf_assign(array_repeat(CAST(0.0 AS DOUBLE), 64), 16) AS c").head().getInt(0)
    val hof = spark.sql(
      s"""SELECT $hofAssign AS c FROM (
         |  SELECT $hofCosts AS costs FROM (
         |    SELECT array_repeat(CAST(0.0 AS DOUBLE), 64) AS v))""".stripMargin)
      .head().getInt(0)
    assert(n == hof)
  }
}
