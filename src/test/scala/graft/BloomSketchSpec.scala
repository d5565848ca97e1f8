package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.BloomSketch

/** Bloom sketch pair (graft_bloom_agg / graft_bloom_contains) — the
  * semi-join-reduction primitive behind `text_decontam_bloom`. The
  * contract under test: NO false negatives ever (that is what makes the
  * prefilter semantics-free under an exact confirm), bounded false
  * positives at the documented sizing, partitioning-independent sketch
  * bytes (bit-OR merge commutes), and a measured pruning ratio on the
  * battery's own corpus shape.
  */
class BloomSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val NumBits = 131072
  private val NumHashes = 6

  private def sketchOf(keys: Seq[Long], partitions: Int): Array[Byte] = {
    import spark.implicits._
    keys.toDF("k").repartition(partitions)
      .agg(expr(s"graft_bloom_agg(k, $NumBits, $NumHashes)"))
      .head().getAs[Array[Byte]](0)
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 10000L).map(i => BloomSketch.mix(i) ^ (i * 7919L))
    val bloom = sketchOf(keys, 8)
    assert(keys.forall(BloomSketch.mightContain(bloom, _)))
  }

  test("false-positive rate at ~13 bits/key stays under 1%") {
    val inserted = (0L until 10000L).map(_ * 2654435761L + 11L)
    val bloom = sketchOf(inserted, 8)
    val insertedSet = inserted.toSet
    val disjoint = (0L until 20000L).map(_ * 9576890767L + 3L).filterNot(insertedSet)
    val fp = disjoint.count(BloomSketch.mightContain(bloom, _))
    // m/n = 13.1, k = 6 → theoretical FPR ≈ 0.16%; 1% leaves slack
    // without ever letting a quadratic-regime regression pass
    assert(fp.toDouble / disjoint.size < 0.01,
      s"FPR ${fp.toDouble / disjoint.size} over ${disjoint.size} disjoint keys")
  }

  test("sketch bytes are partitioning-independent (merge is exact OR)") {
    val keys = (0L until 5000L).map(i => i * 31L - 17L)
    assert(java.util.Arrays.equals(sketchOf(keys, 1), sketchOf(keys, 13)))
  }

  test("NULL keys are skipped like an equi-join would") {
    import spark.implicits._
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L), None)
      .toDF("k")
      .agg(expr(s"graft_bloom_agg(k, $NumBits, $NumHashes)"))
      .head().getAs[Array[Byte]](0)
    val noNulls = sketchOf(Seq(1L, 2L), 1)
    assert(java.util.Arrays.equals(withNulls, noNulls))
  }

  test("decontam prefilter prunes the corpus and loses no true match") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS tokens")
      .filter(size(col("tokens")) >= 3)
    val probes = docs.filter(col("doc_id").isin(5L, 42L, 200L))
      .selectExpr("explode(graft_shingle_hash64(tokens)) AS sh").distinct()
    val sketch = probes.agg(
      expr(s"graft_bloom_agg(sh, $NumBits, $NumHashes)").as("bloom"))
    val corpusSh = docs.selectExpr("doc_id", "explode(graft_shingle_hash64(tokens)) AS sh")
    val total = corpusSh.count()
    val survivors = corpusSh.crossJoin(broadcast(sketch))
      .filter(expr("graft_bloom_contains(bloom, sh)")).drop("bloom")
    val nSurvivors = survivors.count()
    val trueHits = corpusSh.join(probes, "sh").count()
    val confirmed = survivors.join(probes, "sh").count()
    assert(confirmed == trueHits, "prefilter must lose no true match")
    assert(nSurvivors >= trueHits && nSurvivors < total / 2,
      s"expected a real reduction: $nSurvivors survivors of $total shingle rows")
  }

  test("battery query evaluates the bloom probe inside a codegen span") {
    // AQE's wrapper hides codegen stages from collect — audit with it off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      SparkEntry.queries("text_decontam_bloom")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.exists(_.toString.contains("graft_bloom_contains")),
      s"expected the bloom probe inside WholeStageCodegen:\n$plan")
  }
}
