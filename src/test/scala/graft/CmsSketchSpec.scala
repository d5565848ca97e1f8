package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch (graft_cms_agg) — the frequency member of the
  * mergeable-sketch family, behind `agg_cms_estimate`. Contract under
  * test: the point estimate NEVER under-counts (what makes the sketch
  * safe as a heavy-hitter screen), counters are partitioning-
  * independent (element-wise-sum merge commutes), exact on
  * collision-free input, and NULL tokens are skipped.
  */
class CmsSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val D = 4
  private val W = 64

  private def sketchOf(toks: Seq[String], partitions: Int): Seq[Long] = {
    import spark.implicits._
    toks.toDF("tok").repartition(partitions)
      .agg(expr(s"graft_cms_agg(tok, $D, $W)"))
      .head().getSeq[Long](0)
  }

  private def estimate(cms: Seq[Long], tok: String): Long =
    (0 until D).map { d =>
      cms(d * W + graft.expressions.CmsSketch.bucket(
        d, org.apache.spark.unsafe.types.UTF8String.fromString(tok), W))
    }.min

  test("estimates never under-count, even under heavy collision pressure") {
    // 500 distinct tokens into 64-wide rows: collisions guaranteed
    val toks = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val cms = sketchOf(toks, 8)
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (t, n) =>
      assert(estimate(cms, t) >= n, s"undercount for $t")
    }
    // total mass per row is exactly the input size (nothing dropped)
    (0 until D).foreach { d =>
      assert(cms.slice(d * W, (d + 1) * W).sum == toks.size.toLong)
    }
  }

  test("counters are partitioning-independent (merge is element-wise sum)") {
    val toks = (0 until 300).map(i => s"w${i % 40}")
    assert(sketchOf(toks, 1) == sketchOf(toks, 13))
  }

  test("exact on a collision-free tiny vocabulary") {
    val toks = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val cms = sketchOf(toks, 4)
    // 3 tokens in 64 buckets: verify estimates equal truth unless the
    // 3 tokens collide in EVERY row (probability ~(3/64)^4 — and the
    // fixture is fixed, so this either always passes or never does)
    assert(estimate(cms, "alpha") == 5L)
    assert(estimate(cms, "beta") == 3L)
    assert(estimate(cms, "gamma") == 1L)
  }

  test("NULL tokens are skipped, not counted") {
    import spark.implicits._
    val cms = Seq(Some("x"), None, Some("x"), None).toDF("tok")
      .agg(expr(s"graft_cms_agg(tok, $D, $W)"))
      .head().getSeq[Long](0)
    (0 until D).foreach(d => assert(cms.slice(d * W, (d + 1) * W).sum == 2L))
  }
}
