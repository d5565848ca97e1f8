package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING CONTAINMENT SCREEN (VERDICT r13 #8) — the micro-batch
  * twin of `dedup_containment_incr`, completing the incremental-dedup
  * triple beside [[EventStreams.bandIndexSink]] (Jaccard bands) and
  * [[EventStreams.winnowIndexSink]] (winnow prints): the corpus's FULL
  * distinct shingle sets live in a doc-hash-bucketed
  * [[graft.operators.TableMerge]] table maintained per micro-batch,
  * and a probe batch is screened for "already substantially inside the
  * corpus" — containment of the probe doc ≥ threshold — the
  * asymmetric excerpt case Jaccard bands structurally miss.
  *
  * Reference tie: the reference re-runs its full dedup pass per scrape
  * cycle (`silver/transformer.py` drop_duplicates at
  * silver-build time); here a day's crawl screens against the
  * persisted index at O(batch shingles ⋈ matching entries) without
  * touching corpus-sized state.
  *
  * Unlike band signatures (fixed band_idx slots) and like winnow
  * prints, a re-scrape CHANGES THE SET of shingles, so maintenance is
  * `replaceKeys` with dropGroups = the batch's (bucket, doc_id) pairs:
  * stale shingles of re-scraped docs drop, the new set inserts, one
  * partition-scoped commit — quiet buckets hard-link (inodes pinned by
  * ContainmentStreamSpec). dropGroups derives from the batch DOC list,
  * not the shingle rows, so a re-scrape to a too-short text correctly
  * clears the doc's entry.
  *
  * Scale posture: identical to the winnow sink — per-batch cost is
  * O(batch + touched-bucket state), independent of index size; the
  * probe join df-caps the index side so a boilerplate shingle never
  * fans out, and candidate volume is Σ df² bounded by the cap.
  */
object ContainmentStream {

  /** Per-doc distinct shingle rows `(doc_id, sh)` — identical
    * expressions to the batch battery's containment queries
    * (`graft_shingle_set(graft_word_fps(...))`), so stream and batch
    * cannot drift. Docs shorter than the 3-token shingle width emit
    * nothing (and a sink merge still CLEARS their stale rows). */
  def docShingles(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "split(text, ' ') AS tokens")
      .filter(size(col("tokens")) >= 3)
      .selectExpr("doc_id", "graft_shingle_set(graft_word_fps(tokens)) AS shset")
      .select(col("doc_id"), explode(col("shset")).as("sh"))

  /** STREAMING maintenance of the persisted shingle inverted index:
    * each micro-batch replaces its documents' shingle SETS in the
    * doc-hash-bucketed TableMerge table. */
  def shingleIndexSink(docs: DataFrame, tablePath: String, checkpointDir: String,
                       nBuckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          // within-batch duplicate rows collapse; which TEXT wins for a
          // same-batch re-scrape is the caller's to resolve upstream —
          // the same contract as winnowIndexSink
          val rows = docShingles(batch)
            .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))
            .dropDuplicates("bucket", "doc_id", "sh")
          val dropGroups = batch.select("doc_id").distinct()
            .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))
            .select("bucket", "doc_id")
          TableMerge.replaceKeys(batch.sparkSession, tablePath, rows, dropGroups,
            groupKeys = Seq("bucket", "doc_id"), partitionCols = Seq("bucket"))
        }
      }
      .start()

  /** Screen probe documents against a shingle index (stream-built or
    * batch-built): df-cap the index side, equi-join on the shingle,
    * count shared shingles per (probe, corpus) pair — the shared count
    * IS |probe ∩ corpus| because both sides are distinct sets — and
    * keep pairs where containment of the PROBE doc ≥ thresholdE4.
    * Pure integer arithmetic: (shared·10000) DIV |probe shingles|.
    * Returns `(probe_id, corpus_id, cont_e4)`. */
  def containmentScreen(probe: DataFrame, index: DataFrame,
                        dfCap: Long = 32L, thresholdE4: Long = 8000L): DataFrame = {
    val census = index.groupBy("sh").agg(count(lit(1)).as("df"))
    val cold = index.join(census.filter(col("df") <= dfCap).select("sh"), Seq("sh"))
    val psh = docShingles(probe)
      .select(col("doc_id").as("probe_id"), col("sh"))
      .localCheckpoint() // feeds both the size aggregate and the index join
    val pSizes = psh.groupBy("probe_id").agg(count(lit(1)).as("np"))
    psh.join(cold.select(col("doc_id").as("corpus_id"), col("sh")), Seq("sh"))
      .groupBy("probe_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .join(pSizes, "probe_id")
      .selectExpr("probe_id", "corpus_id", "(shared * 10000) DIV np AS cont_e4")
      .filter(col("cont_e4") >= thresholdE4)
  }
}
