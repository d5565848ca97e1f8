package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** Trained-model data-selection tier: linear classifiers trained
  * IN-ENGINE by iterative relational passes, completing the
  * data-selection triptych — rules ([[TextCurationQueries]] Gopher/C4),
  * generative scores ([[LmQueries]] NB / n-gram log-prob), and now a
  * DISCRIMINATIVE model whose weights come from gradient-style updates
  * (the GPT-3/LLaMA "quality filter" shape: a linear classifier trained
  * to tell curated domains from the raw crawl, then applied to score
  * every raw document — Brown et al. 2020 §A; fastText's supervised
  * mode is the standard implementation).
  *
  * Everything follows the exact-integer discipline: features are hashed
  * token counts (BIGINT), weights are BIGINT, and the batch-perceptron
  * update rule w += Σ_misclassified y·x is pure integer addition, so
  * Spark and the unrolled DuckDB CTE chain agree bit-for-bit — no
  * learning-rate floats, no sigmoid.
  */
private[queries] object ClassifierQueries {

  /** Fixed epoch count — unrolled into both engines (the [[BpeQueries]]
    * loop-unroll discipline); epoch 1 from all-zero weights updates on
    * EVERY doc (y·0 ≤ 0), so w1 is the class-difference vector and
    * later epochs refine it. */
  private val Epochs = 4

  /** Hashed feature space (64 unigram buckets + the constant bias
    * feature b = −1) — the fastText hashing-trick vocabulary, sized so
    * the weight vector is always broadcastable (65 rows at ANY corpus
    * scale). */
  private val Buckets = 64L

  /** Batch-perceptron domain classifier — train on "curated" (src0/
    * src1) vs "crawl" (the rest), then score every doc with the final
    * weights. Output: per-source confusion census (docs, positive
    * labels, positive predictions, correct) with the weight-vector
    * checksum riding every row, so training drift anywhere flips the
    * hash.
    *
    * Scale posture: the feature frame (doc_id, bucket, count) builds
    * once (one explode + partial-agg groupBy, localCheckpointed); each
    * epoch is ONE broadcast join of the ≤65-row weight table + a
    * per-doc partial agg + a per-bucket 65-row agg — no driver-side
    * loops over data, no global sort; the number of epochs, not the
    * corpus size, bounds the chain depth. At 100 TB the per-epoch cost
    * is two scans of the checkpointed feature frame; the weight state
    * never leaves broadcast range.
    */
  /** The batch-perceptron training loop over a `(doc_id, b, n)` feature
    * frame and a `(doc_id, …, y)` label frame — exposed for
    * ClassifierSpec, which proves on a hand-built SEPARABLE fixture
    * that the loop actually learns (the synthetic documents corpus has
    * near-uniform per-source token distributions, so the battery row's
    * honest outcome there is "no separation found" — the hash pins the
    * exact recurrence, the spec pins the learning). Returns the final
    * `(b, w)` weight table (≤ feature-space rows, broadcastable). */
  private[queries] def perceptronWeights(feats: DataFrame, lab: DataFrame,
      epochs: Int): DataFrame = {
    var w = feats.select("b").distinct()
      .withColumn("w", lit(0L)).localCheckpoint() // <= 65 rows
    for (_ <- 1 to epochs) {
      val scores = feats.join(broadcast(w), Seq("b"))
        .groupBy("doc_id").agg(sum(col("n") * col("w")).as("sc"))
      val mis = scores.join(lab.select("doc_id", "y"), Seq("doc_id"))
        .filter(col("y") * col("sc") <= 0).select("doc_id", "y")
      val delta = mis.join(feats, Seq("doc_id"))
        .groupBy("b").agg(sum(col("y") * col("n")).as("dw"))
      w = w.join(delta, Seq("b"), "left")
        .select(col("b"), (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
        .localCheckpoint()
    }
    w
  }

  private val textPerceptron: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val lab = docs.selectExpr("doc_id", "source",
      "CAST(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE -1 END AS BIGINT) AS y")
      .localCheckpoint()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .selectExpr("doc_id", s"graft_str_fp(tok) % $Buckets AS b")
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
    val feats = tf.unionByName(
      docs.select(col("doc_id"), lit(-1L).as("b"), lit(1L).as("n")))
      .localCheckpoint() // reused 2x per epoch: scoring + the delta agg
    val w = perceptronWeights(feats, lab, Epochs)
    val finalScores = feats.join(broadcast(w), Seq("b"))
      .groupBy("doc_id").agg(sum(col("n") * col("w")).as("sc"))
    val pred = finalScores.join(lab, Seq("doc_id"))
      .withColumn("pred", when(col("sc") > 0, 1L).otherwise(-1L))
    val wsum = w.agg(sum("w").as("w_sum"), sum(abs(col("w"))).as("w_abs_sum"))
    pred.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos_label"),
        sum(when(col("pred") === 1L, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(wsum))
      .orderBy("source")
  }

  val queries: Seq[(String, Q)] = Seq(
    "text_perceptron" -> textPerceptron,
  )

  /** The epoch recurrence unrolled as CTEs (w0 → s1/m1/d1/w1 → …),
    * exactly the [[BpeQueries]] replay discipline. */
  private def duckEpochs: String = (1 to Epochs).map { e =>
    s"""s$e AS (
       |  SELECT f.doc_id, sum(f.n * w.w) AS sc
       |  FROM feats f JOIN w${e - 1} w USING (b) GROUP BY 1),
       |m$e AS (
       |  SELECT l.doc_id, l.y FROM s$e JOIN lab l USING (doc_id)
       |  WHERE l.y * s$e.sc <= 0),
       |d$e AS (
       |  SELECT f.b, sum(m.y * f.n) AS dw
       |  FROM m$e m JOIN feats f USING (doc_id) GROUP BY 1),
       |w$e AS (
       |  SELECT w.b, w.w + coalesce(d.dw, 0) AS w
       |  FROM w${e - 1} w LEFT JOIN d$e d USING (b))""".stripMargin
  }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "text_perceptron" ->
      s"""WITH tk AS (
         |  SELECT s.doc_id, ${duckFp("u.tok")} % $Buckets AS b
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s,
         |    UNNEST(s.t) u(tok)),
         |tf AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
         |  FROM tk GROUP BY 1, 2),
         |feats AS (
         |  SELECT * FROM tf
         |  UNION ALL
         |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
         |lab AS (
         |  SELECT doc_id, source,
         |    CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE -1 END AS y
         |  FROM documents),
         |w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM feats),
         |$duckEpochs,
         |fs AS (
         |  SELECT f.doc_id, sum(f.n * w.w) AS sc
         |  FROM feats f JOIN w$Epochs w USING (b) GROUP BY 1),
         |pr AS (
         |  SELECT l.source, l.y,
         |    CASE WHEN fs.sc > 0 THEN 1 ELSE -1 END AS pred
         |  FROM fs JOIN lab l USING (doc_id)),
         |ws AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS w_sum,
         |    CAST(sum(abs(w)) AS BIGINT) AS w_abs_sum
         |  FROM w$Epochs)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_label,
         |  CAST(sum(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
         |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  ws.w_sum, ws.w_abs_sum
         |FROM pr, ws
         |GROUP BY source, ws.w_sum, ws.w_abs_sum ORDER BY source""".stripMargin,
  )
}
