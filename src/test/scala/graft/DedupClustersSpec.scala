package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupClusters

/** Connected-components clustering over near-dup candidate pairs:
  * chains collapse to one cluster, disjoint components stay apart,
  * representatives are the minimum member ids.
  */
class DedupClustersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("chain and disjoint components resolve to min-id clusters") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 20)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("representatives flag exactly one node per cluster") {
    import spark.implicits._
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val reps = DedupClusters.representatives(
      DedupClusters.connectedComponents(pairs, "id_a", "id_b"))
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(reps == Seq((5L, 5L, true), (6L, 5L, false), (7L, 5L, false)))
  }

  test("long chain converges within the diameter bound") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(pairs, "id_a", "id_b", maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 12)
  }

  test("pointer jumping resolves a deep chain in O(log d) rounds with identical labels") {
    import spark.implicits._
    // a 40-node chain has diameter 39: plain propagation cannot finish
    // in 9 rounds, the pointer-jump variant must (paths halve per round)
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      DedupClusters.connectedComponents(pairs, "id_a", "id_b", maxIter = 9,
        pointerJump = Some(false)).count()
    }
    val got = DedupClusters.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 9, pointerJump = Some(true))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.toSet == Set(1L))
  }

  test("adaptive default detects the deep chain and self-enables the jump") {
    import spark.implicits._
    // DEFAULT ARGS (no pointerJump hint): the moving-label count stops
    // halving after round 2, the shortcut switches on, and the chain
    // resolves well inside a budget plain propagation provably cannot
    // meet (the Some(false) case above throws at maxIter = 9)
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(pairs, "id_a", "id_b", maxIter = 9)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.toSet == Set(1L))
  }
}
