package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Perceptron training sanity beyond the oracle hash: the battery row
  * pins the exact weights/confusion on the documents corpus (whose
  * per-source token distributions are near-uniform by construction, so
  * its honest outcome is "no separation found"); this spec proves on a
  * hand-built linearly separable fixture that the training loop
  * actually LEARNS — and that the battery row's confusion census is
  * internally consistent.
  */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val rows = ClassifierQueries.queries.toMap
    .apply("text_perceptron")(spark, "/root/testdata/sf0.001").collect()

  /** 8 docs, separable by construction: positives carry feature 1,
    * negatives feature 2; both share the noise feature 3 and bias −1. */
  private def fixture = {
    import spark.implicits._
    val feats = (0L until 8L).flatMap { i =>
      val cls = if (i < 4) 1L else 2L
      Seq((i, cls, 3L), (i, 3L, 1L), (i, -1L, 1L))
    }.toDF("doc_id", "b", "n")
    val lab = (0L until 8L).map(i => (i, if (i < 4) 1L else -1L))
      .toDF("doc_id", "y")
    (feats, lab)
  }

  test("training separates a separable fixture perfectly") {
    val (feats, lab) = fixture
    val w = ClassifierQueries.perceptronWeights(feats, lab, 4)
    val fit = feats.join(broadcast(w), Seq("b"))
      .groupBy("doc_id").agg(sum(col("n") * col("w")).as("sc"))
      .join(lab, Seq("doc_id"))
      .selectExpr("CASE WHEN y * sc > 0 THEN 1 ELSE 0 END AS ok")
      .agg(sum("ok")).collect().head.getLong(0)
    assert(fit == 8L, s"only $fit/8 separated on a separable fixture")
  }

  test("separable fixture weights: class features get opposite signs") {
    val (feats, lab) = fixture
    val wm = ClassifierQueries.perceptronWeights(feats, lab, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wm(1L) > 0L, s"positive-class feature weight ${wm(1L)} not > 0")
    assert(wm(2L) < 0L, s"negative-class feature weight ${wm(2L)} not < 0")
  }

  test("battery confusion counts are internally consistent per source") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pos, predPos, correct) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pos <= n && predPos <= n && correct <= n)
      // single-label sources in the fixture: pos is 0 or n
      assert(pos == 0L || pos == n)
    }
  }

  test("battery weight checksum is identical on every row and training moved it") {
    assert(rows.map(r => (r.getLong(5), r.getLong(6))).distinct.length == 1)
    assert(rows.head.getLong(6) > 0L, "all-zero weights: training did nothing")
  }
}
