package graft

import org.scalatest.funsuite.AnyFunSuite

/** APSS prefix filter: the candidate set provably loses no qualifying
  * pair — `sim_apss_pairs` must equal the brute-force inverted-join
  * truth computed here without any prefix pruning, and the census's
  * measured candidate count must sit strictly under the full
  * inverted-join bound it rides beside.
  */
class SparseSimSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("prefix-filtered pairs == brute-force truth (lossless)") {
    import org.apache.spark.sql.functions._
    import graft.queries.PipelineShared.winnowHashesExpr
    val filtered = SparkEntry.queries("sim_apss_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute truth: same weights, full inverted join, no prefix stage
    val base = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS tokens")
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 17 === 0 && size(col("tokens")) >= 20)
        .select((col("doc_id") + 700000).as("doc_id"),
          expr("slice(tokens, 2, size(tokens) - 6)").as("tokens")))
      .filter(size(col("tokens")) >= 3)
    val sh = corpus.withColumn("hashes", expr(winnowHashesExpr(3)))
      .select(col("doc_id"), explode(col("hashes")).as("sh"))
    val tf = sh.groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("sh").agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n"))
    val w = tf.join(dfs, "sh").crossJoin(broadcast(n))
      .selectExpr("doc_id", "sh",
        "tf * CAST(floor(ln(CAST(n AS DOUBLE) / df) * 1000000) AS BIGINT) AS w")
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("nrm"))
    val brute = w.as("l").join(w.as("r"),
        col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("d0"), col("r.doc_id").as("d1"))
      .agg(sum(col("l.w") * col("r.w")).as("dot"))
      .join(norms.select(col("doc_id").as("d0"), col("nrm").as("n0")), Seq("d0"))
      .join(norms.select(col("doc_id").as("d1"), col("nrm").as("n1")), Seq("d1"))
      .selectExpr("d0", "d1",
        "CAST(floor(CAST(dot AS DOUBLE) / (n0 * n1) * 1000000) AS BIGINT) AS cos_e6")
      .filter(col("cos_e6") >= 500000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(brute.nonEmpty, "fixture degenerate: no qualifying pairs at sf0.001")
    assert(filtered == brute,
      s"missed=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
  }

  test("census: candidates < full inverted-join bound, truth pairs found") {
    val r = SparkEntry.queries("sim_apss_census")(spark, sf).head()
    val (nCand, fullPairs) = (r.getAs[Long]("n_cand"), r.getAs[Long]("full_pairs"))
    assert(nCand < fullPairs, s"prefix filter pruned nothing: $nCand vs $fullPairs")
    assert(r.getAs[Long]("n_true") > 0, "no injected near-dup pair verified")
    assert(r.getAs[Long]("n_verified") >= r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("n_prefix") < r.getAs[Long]("n_postings"))
  }
}
