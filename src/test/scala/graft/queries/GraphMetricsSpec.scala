package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Triangle census on known-count fixtures: the battery oracle replays
  * the same orientation algorithm in DuckDB, so a conceptual miscount
  * shared by both engines would survive parity — these hand graphs pin
  * the concept (exact counts, once-per-triangle emission, clustering
  * coefficient arithmetic) against closed-form truth.
  */
class GraphMetricsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def census(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    GraphMetricsQueries.triangleCensus(
        edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct.toDF("u0", "v0"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
  }

  test("K4: C(4,3)=4 triangles, every node in 3, clustering coefficient 1") {
    val k4 = for (i <- 0L until 4L; j <- i + 1 until 4L) yield (i, j)
    val got = census(k4)
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    got.values.foreach { case (deg, nTri, cc, total, edges) =>
      assert(deg == 3L && nTri == 3L && total == 4L && edges == 6L)
      assert(cc == 10000L, s"cc $cc != 1.0 on a complete graph")
    }
  }

  test("path graph is triangle-free") {
    assert(census(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("hub star plus one chord: exactly the one triangle, skew-safe") {
    // hub 0 connected to 1..10; single chord (1,2) closes one triangle
    val star = (1L to 10L).map(i => (0L, i)) :+ ((1L, 2L))
    val got = census(star)
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L)._2 == 1L && got(1L)._2 == 1L && got(2L)._2 == 1L)
    assert(got.values.head._4 == 1L, "exactly one triangle")
    // hub: deg 10, 1 triangle -> cc = 20000/90 = 222 e4
    assert(got(0L)._3 == 222L)
  }
}
