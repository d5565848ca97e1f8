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

  // ---- MinHash band-shape tuner (the Jaccard-space sibling) ----

  import graft.operators.MinHashTuner

  private val MinhashSpec = "1000003,12345;999983,54321;999979,11111;1000033,77777"
  private val Shapes = Seq((1, 4), (2, 2), (4, 1))

  private def shingledSf0001 = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "split(text, ' ') AS tokens")
    val dups = docs.filter(col("doc_id") % 20 === 0)
      .selectExpr("doc_id + 100000 AS doc_id",
        "slice(tokens, 2, size(tokens) - 1) AS tokens")
    docs.union(dups).filter(size(col("tokens")) >= 3)
      .selectExpr("doc_id", "graft_shingle_set(graft_word_fps(tokens)) AS shset")
  }

  test("minhash census: candidate volume decreases with r (band coincidences nest)") {
    val sh = shingledSf0001.cache()
    try {
      val Seq(c14, c22, c41) =
        Shapes.map { case (r, b) => MinHashTuner.census(sh, MinhashSpec, r, b) }
      assert(c14.nDocs == c22.nDocs && c22.nDocs == c41.nDocs)
      // a band coincidence at r=2k implies one at r=k (bands refine),
      // so pre-distinct candidate volume is monotone in r
      assert(c14.candPairs >= c22.candPairs && c22.candPairs >= c41.candPairs)
      assert(c41.candPairs > 0, "fixture degenerate: no near-dups collide at r=4")
    } finally { sh.unpersist(); () }
  }

  test("minhash chooser takes the smallest bounded r (max recall), damage-control otherwise") {
    val sh = shingledSf0001.cache()
    try {
      val (chosen, all) = MinHashTuner.choose(sh, MinhashSpec, Shapes, maxPairsPerDoc = 1e9)
      assert(chosen.r == 1 && chosen.b == 4) // everything bounded → max recall
      assert(all.size == 3)
      val (strict, _) = MinHashTuner.choose(sh, MinhashSpec, Shapes, maxPairsPerDoc = -1.0)
      assert(strict.r == 4 && strict.b == 1) // nothing bounded → most selective
    } finally { sh.unpersist(); () }
  }

  test("recall at the census-tuned shape dominates the shipped r=2/b=2 shape") {
    import spark.implicits._
    val sh = shingledSf0001.cache()
    try {
      def pairs(r: Int, b: Int): Set[(Long, Long)] =
        MinHashTuner.confirmedPairs(sh, MinhashSpec, r, b)
          .as[(Long, Long)].collect().toSet
      val Seq(p14, p22, p41) = Shapes.map { case (r, b) => pairs(r, b) }
      // confirmed sets nest with r for the same permutation family
      assert(p41.subsetOf(p22) && p22.subsetOf(p14))
      assert(p22.nonEmpty, "fixture degenerate: shipped shape finds nothing")
      // the chooser can only move r DOWN from the shipped 2 when bounded,
      // so its confirmed set is a superset of the shipped one
      val (chosen, _) = MinHashTuner.choose(sh, MinhashSpec, Shapes, maxPairsPerDoc = 64.0)
      assert(chosen.r <= 2, s"census says sf0.001 cannot afford r<=2: $chosen")
      assert(p22.subsetOf(pairs(chosen.r, chosen.b)))
    } finally { sh.unpersist(); () }
  }
}
