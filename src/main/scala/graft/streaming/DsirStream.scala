package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SamplerQueries

/** STREAMING DSIR SELECTION — the stream twin of the battery's
  * `sample_dsir`: the hashed-bigram importance weights are trained ONCE
  * from a reference census (the paper's own protocol — Xie et al. 2023
  * estimate the target/raw bucket distributions from a fixed sample,
  * then score the whole pool against the FROZEN weight table), and the
  * global top-k selection over everything ingested is maintained
  * incrementally in a [[graft.operators.TableMerge]] table.
  *
  * With frozen weights a doc's score is a pure function of the doc, so
  * top-k by (w_e6 desc, doc_id asc) is an associative, idempotent
  * fold — top-k(state ∪ batch) = top-k(all docs so far) at ANY batch
  * boundary, and re-delivering a batch cannot displace anything
  * (DsirStreamSpec proves both). This is the streaming-selection
  * counterpart of [[SamplerStream]]'s per-source bottom-k: same fold
  * discipline, importance-weight key instead of a hash key.
  *
  * Scale posture: per batch, scoring is one explode + partial-agg
  * groupBy over the BATCH (the ≤64-row weight table broadcasts); the
  * state read is k rows; the commit rewrites one k-row group. Nothing
  * corpus-shaped is ever rescanned.
  */
object DsirStream {

  /** Batch twin: score `docs` against the frozen weights and take the
    * global top-k (what the stream-maintained table must equal). */
  def batchSelect(docs: DataFrame, wts: DataFrame, k: Int = 50): DataFrame =
    SamplerQueries.dsirScore(SamplerQueries.dsirFeats(docs), wts)
      .orderBy(col("w_e6").desc, col("doc_id").asc).limit(k)

  /** Train the weight table from a reference corpus frame (target =
    * src0 rows, raw = the rest) — run once, then passed frozen. */
  def trainWeights(referenceDocs: DataFrame): DataFrame =
    SamplerQueries.dsirWeights(SamplerQueries.dsirFeats(referenceDocs))
      .localCheckpoint()

  /** Streaming maintenance of the persisted top-k selection. */
  def topKSelectSink(docs: DataFrame, wts: DataFrame, tablePath: String,
                     checkpointDir: String,
                     k: Int = 50): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          val spark = batch.sparkSession
          val cand = SamplerQueries.dsirScore(SamplerQueries.dsirFeats(batch), wts)
            .withColumn("grp", lit(0))
            .localCheckpoint() // scored once; feeds union + the merge
          val prior =
            if (TableMerge.exists(tablePath))
              TableMerge.read(spark, tablePath)
                .select("doc_id", "source", "w_e6", "grp")
            else cand.limit(0)
          val rows = cand.unionByName(prior)
            .dropDuplicates("doc_id")
            .orderBy(col("w_e6").desc, col("doc_id").asc).limit(k)
            .localCheckpoint() // k rows; feeds touched + the commit
          val touched = rows.select("grp").distinct()
          TableMerge.replaceKeys(spark, tablePath, rows, touched,
            groupKeys = Seq("grp"), partitionCols = Seq("grp"))
        }
      }
      .start()
}
