package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STREAMING QUOTA SAMPLER — the stream twin of the battery's
  * `sample_bottomk` (exactly k docs per source, chosen by the portable
  * rolling-hash key): the persisted sample lives in a
  * source-hash-bucketed [[graft.operators.TableMerge]] table and each
  * micro-batch merges its candidates in WITHOUT rescanning the corpus.
  *
  * Bottom-k by a deterministic per-doc key is an associative,
  * idempotent fold — min-k(state ∪ batch) = min-k(corpus so far) — so
  * the stream-maintained sample is BIT-IDENTICAL to the batch query
  * over everything ingested, at any batch boundary (SamplerStreamSpec
  * proves it across re-deliveries too, since re-merging the same doc
  * cannot displace anything).
  *
  * This is how a 100 TB pipeline keeps a live eval/debug sample per
  * domain: per-batch cost is O(batch + k·touched sources) — the state
  * read is a semi-join of the batch's sources against a table whose
  * size is k·n_sources, never corpus-shaped; quiet source buckets
  * hard-link (inodes pinned by the spec).
  */
object SamplerStream {

  /** Candidate rows with the battery's sample key — identical
    * expressions to `sample_bottomk`, so stream and batch cannot
    * drift. */
  private def keyed(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "source",
      "graft_str_fp(concat(CAST(doc_id AS STRING), '||sample')) AS samp_key")

  /** Per-source bottom-k of a (doc_id, source, samp_key) frame. */
  private def bottomK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("samp_key"), col("doc_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Batch twin over a whole docs frame (what the stream must equal). */
  def batchSample(docs: DataFrame, k: Int = 5): DataFrame =
    bottomK(keyed(docs), k)

  /** STREAMING maintenance of the persisted per-source sample: each
    * micro-batch unions its keyed candidates with the touched sources'
    * CURRENT sample rows, re-takes the bottom-k, and replaces exactly
    * those sources' groups — one partition-scoped commit. */
  def quotaSampleSink(docs: DataFrame, tablePath: String, checkpointDir: String,
                      k: Int = 5,
                      nBuckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          val spark = batch.sparkSession
          val cand = keyed(batch)
            .withColumn("bucket", pmod(hash(col("source")), lit(nBuckets)))
            .dropDuplicates("bucket", "source", "doc_id")
            .localCheckpoint() // feeds the state join and the merge input
          val touched = cand.select("bucket", "source").distinct()
          val prior =
            if (TableMerge.exists(tablePath))
              TableMerge.read(spark, tablePath)
                .join(touched.select("source").distinct(), Seq("source"), "left_semi")
                .select("doc_id", "source", "samp_key", "bucket")
            else cand.limit(0).select("doc_id", "source", "samp_key", "bucket")
          val rows = bottomK(
            cand.select("doc_id", "source", "samp_key", "bucket")
              .unionByName(prior)
              .dropDuplicates("source", "doc_id"), k)
          TableMerge.replaceKeys(spark, tablePath, rows, touched,
            groupKeys = Seq("bucket", "source"), partitionCols = Seq("bucket"))
        }
      }
      .start()
}
