package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshTuner

/** Census-based LSH band-width tuning: exact census arithmetic on a
  * hand-countable corpus, widening until the candidate-volume bound is
  * met on a spread corpus, no-op when the starting width already meets
  * it, and the honest-failure contract on an unsplittable corpus
  * (identical vectors collide at EVERY width — the tuner must report
  * the measured volume at maxBits, not pretend the bound was met).
  */
class LshTunerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("census arithmetic is exact on a hand-countable corpus") {
    // three identical vectors: every band has one bucket of n=3 →
    // candPairs = bands × 3·2/2 = 6, maxBucket 3, nRows = 3 vectors × 2 bands
    val c = LshTuner.census(
      vecs(Seq(1L, 2L, 3L).map(i => (i, Seq.fill(64)(0.5)))),
      "embedding", bands = 2, bits = 4)
    assert(c == LshTuner.Census(4, 6L, 3L, 6L))
    assert(c.pairsPerRow == 1.0)
  }

  test("tuner widens from minBits until the volume bound is met") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // at 2 bits, 500 vectors land in ≤4 buckets per band — thousands of
    // pairs per row; the tuner must walk wider and actually meet the bound
    val start = LshTuner.census(corpus, "embedding", bands = 2, bits = 2)
    assert(start.pairsPerRow > 24.0)
    val tuned = LshTuner.chooseBandBits(corpus, "embedding", bands = 2,
      maxPairsPerRow = 24.0, minBits = 2, maxBits = 12, step = 2)
    assert(tuned.bits > 2 && tuned.bits <= 12)
    assert(tuned.pairsPerRow <= 24.0)
  }

  test("tuner keeps minBits when occupancy is already bounded") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val tuned = LshTuner.chooseBandBits(corpus, "embedding", bands = 2,
      maxPairsPerRow = 1e9, minBits = 8)
    assert(tuned.bits == 8)
  }

  test("unsplittable corpus: tuner reports the measured volume at maxBits") {
    // 40 exact copies never split — no width can separate identical
    // signatures, so the honest answer is maxBits + the true volume
    val corpus = vecs((1L to 40L).map(i => (i, Seq.tabulate(64)(j => (j % 7) * 0.1))))
    val tuned = LshTuner.chooseBandBits(corpus, "embedding", bands = 2,
      maxPairsPerRow = 4.0, minBits = 4, maxBits = 8, step = 2)
    assert(tuned.bits == 8)
    assert(tuned.pairsPerRow > 4.0)
    assert(tuned.candPairs == 2L * 40 * 39 / 2)
  }

  test("zero-row corpus degrades to an empty census, not an NPE") {
    val corpus = vecs(Seq.empty)
    val c = LshTuner.chooseBandBits(corpus, "embedding", bands = 2)
    assert(c.candPairs == 0L && c.nRows == 0L && c.pairsPerRow == 0.0)
  }
}
