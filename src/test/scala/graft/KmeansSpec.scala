package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the relational k-means trainer that the value-hash
  * oracle cannot express: training IMPROVES the quantizer (inertia
  * under trained centroids ≤ inertia under the grid init — Lloyd's
  * monotonicity), and every vector is assigned exactly once.
  */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def inertiaUnder(centsExpr: String): Long = {
    // assign each e6-quantized vector to its nearest of the 8 centroids
    // given by centsExpr (an array<array<bigint>> SQL expression), sum
    // the winning integer distances
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS eq")
      .selectExpr(s"array_min(transform($centsExpr, c -> " +
        "aggregate(zip_with(eq, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x))) AS d")
      .agg(sum("d")).head().getLong(0)
  }

  test("trained centroids have no higher inertia than the grid init (Lloyd monotonicity)") {
    val gridInertia = inertiaUnder(
      "transform(sequence(0, 7), j -> transform(sequence(0, 63), " +
        "i -> CAST((((j * 31 + i * 17) % 19) - 9) * 100000 AS BIGINT)))")
    val out = SparkEntry.queries("sim_kmeans_train")(spark, sf)
      .select(sum("inertia"), sum("n_members")).head()
    val trainedInertia = out.getLong(0)
    val nAssigned = out.getLong(1)
    val nVectors = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(nAssigned == nVectors, "every vector assigned exactly once")
    assert(trainedInertia <= gridInertia,
      s"training worsened the quantizer: $trainedInertia > $gridInertia")
    assert(trainedInertia > 0)
  }
}
