package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native nearest-centroid assignment (`graft_argmin_sq`): bit-identical
  * to the HOF spelling it replaced (transform + aggregate/zip_with +
  * array_min + array_position), including ties (lowest index) and the
  * null contract (null vec / null element / ragged codebook row / empty
  * codebook → null).
  */
class ArgminSqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val hof =
    "named_struct('centroid_id', CAST(array_position(__d, array_min(__d)) - 1 AS INT), " +
      "'dist', array_min(__d))"

  test("equals the HOF composition on a deterministic corpus, ties included") {
    val df = spark.range(500).selectExpr(
      "id AS vec_id",
      // values repeat with period 7 so distinct ids collide onto equal
      // vectors — guaranteeing exact argmin ties across centroids
      "transform(sequence(0, 15), i -> CAST((id % 7) * 31 + i * 5 - 40 AS BIGINT)) AS eq",
      "transform(sequence(0, 11), j -> transform(sequence(0, 15), " +
        "i -> CAST((j % 6) * 29 + i * 5 - 40 AS BIGINT))) AS cv")
    val got = df.selectExpr("vec_id", "graft_argmin_sq(eq, cv) AS am")
      .selectExpr("vec_id", "am.centroid_id AS cid", "am.dist AS dist")
    val want = df
      .selectExpr("vec_id",
        "transform(cv, c -> aggregate(zip_with(eq, c, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)) AS __d")
      .selectExpr("vec_id", s"$hof AS am")
      .selectExpr("vec_id", "am.centroid_id AS cid", "am.dist AS dist")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "native argmin drifted from the HOF composition")
    // centroids j and j+6 are identical → ties must resolve to j < 6
    assert(got.filter("cid >= 6").count() == 0, "tie not broken to the lowest index")
  }

  test("null contract: null vec, null element, ragged row, empty codebook") {
    val rows = spark.sql(
      """SELECT
        |  graft_argmin_sq(CAST(NULL AS ARRAY<BIGINT>), array(array(1L, 2L))) AS a,
        |  graft_argmin_sq(array(1L, CAST(NULL AS BIGINT)), array(array(1L, 2L))) AS b,
        |  graft_argmin_sq(array(1L, 2L), array(array(1L))) AS c,
        |  graft_argmin_sq(array(1L, 2L), array(array(1L, CAST(NULL AS BIGINT)))) AS d,
        |  graft_argmin_sq(array(1L, 2L), CAST(array() AS ARRAY<ARRAY<BIGINT>>)) AS e,
        |  graft_argmin_sq(array(1L, 2L), array(array(3L, 4L), array(1L, 2L))).centroid_id AS ok
        |""".stripMargin).head()
    (0 to 4).foreach(i => assert(rows.isNullAt(i), s"field $i must be null"))
    assert(rows.getInt(5) == 1)
  }
}
