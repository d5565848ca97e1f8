package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native graft_cosine Catalyst expression: correctness vs the HOF
  * composition (bitwise — both accumulate sequentially in f64), null
  * contract, SQL + Column reachability through the session extension,
  * and whole-stage-codegen participation.
  */
class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("matches the zip_with/aggregate composition bitwise") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rng.nextFloat()),
      Seq.fill(64)(rng.nextFloat())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      expr("graft_cosine(a, b)").as("native"),
      VectorFunctions.cosine(
        VectorFunctions.toDouble(col("a")), VectorFunctions.toDouble(col("b"))).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("SQL reachability and known values") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same, " +
        "graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS ortho").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("null contract: null input, length mismatch, zero norm, null element") {
    val r = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n1, " +
        "graft_cosine(array(1.0D, 2.0D), array(1.0D)) AS n2, " +
        "graft_cosine(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS n3, " +
        "graft_cosine(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS n4").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    // the HOF path agrees on the null-element case
    import spark.implicits._
    val hof = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosine(
        org.apache.spark.sql.functions.col("a"), org.apache.spark.sql.functions.col("b")))
      .head()
    assert(hof.isNullAt(0))
  }

  test("mixed float/double arrays accepted") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0))).toDF("f", "d")
    val c = df.select(expr("graft_cosine(f, d)")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // range + array() (not a local literal, no lambda HOFs — those are
    // CodegenFallback and would pull the projection out of codegen)
    val df = spark.range(100)
      .selectExpr("array(CAST(id AS DOUBLE), CAST(id + 1 AS DOUBLE)) AS a",
        "array(CAST(id + 2 AS DOUBLE), CAST(id + 3 AS DOUBLE)) AS b")
      .select(expr("graft_cosine(a, b)").as("c"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "projection did not enter whole-stage codegen")
    assert(wsc.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.nonEmpty), "graft_cosine project not inside the codegen stage")
    // the generated java actually contains our fused loop (not a fallback
    // to interpreted eval)
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("numElements"), "expected array loop in generated code")
    assert(df.count() == 100)
  }
}
