package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.11: the reference has no
  * true streaming — its "incremental" is batch CDC — so this is the
  * engine's forward-looking path: the same event-table shapes exposed as
  * unbounded streams).
  *
  * Design: each transform takes a streaming DataFrame/Dataset and returns
  * the transformed stream — source and sink stay at the edges, so the
  * identical plan runs in batch (see `stream_window_agg`, whose batch
  * plan is this `windowedCounts` minus the watermark). State is bounded
  * by watermarks; at scale the shuffle key is (window, event_type) /
  * user_id, the same keys the batch jobs use.
  */
object EventStreams {

  /** events.parquet physical schema with `ts` as the given type. Two
    * vintages of the testdata exist: TIMESTAMP(NANOS) (read as long
    * under `nanosAsLong`) and timestamp[us]-no-TZ (read as
    * TIMESTAMP_NTZ); [[readEvents]] peeks at the file footer to pick
    * the right one, matching graft.Tables.events.
    */
  def eventFileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a testdata dir (one-file-per-table layout;
    * pathGlobFilter selects the events table). `maxFilesPerTrigger`
    * keeps micro-batches bounded when pointed at a real landing zone.
    * The ts physical type is sniffed from the footer (a driver-side
    * metadata read, not a data scan) so both testdata vintages stream
    * with correct µs semantics; session TZ is UTC so the NTZ cast is
    * value-preserving. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val observed = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val raw = spark.readStream
      .schema(eventFileSchema(observed))
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(sfDir)
    observed match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling event-time window aggregate with a watermark — the
    * streaming twin of `stream_window_agg`. */
  def windowedCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup by event_id, state bounded by the watermark
    * (the streaming twin of the A7/W1 batch dedups). */
  def dedupEvents(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** 31-bit Mersenne prime — the band-value domain the batch dedup tier
    * uses (PipelineQueries), so a streaming index and a batch index are
    * interchangeable. */
  private val BandP = 2147483647L

  /** MinHash band projection of a documents frame (doc_id, text) →
    * (doc_id, band_0, band_1): 3-shingle set → k-permutation signature →
    * r=2 banded values, the same construction the batch incremental
    * dedup uses (`dedup_incremental`). Every step is a per-row
    * projection through the native graft kernels, so the SAME code runs
    * on a static frame and on an unbounded stream. Documents shorter
    * than one shingle (< 3 tokens) carry no signature and are excluded
    * here — [[novelDocuments]] passes them through as novel. */
  def minhashBands(docs: DataFrame, spec: String): DataFrame =
    docs.selectExpr("doc_id", "split(text, ' ') AS tokens")
      .filter(size(col("tokens")) >= 3)
      .selectExpr("doc_id", "graft_shingle_set(graft_word_fps(tokens)) AS shset")
      .selectExpr("doc_id", s"graft_minhash(shset, '$spec') AS sig")
      .selectExpr("doc_id",
        s"(sig[0] * 31 + sig[1]) % $BandP AS band_0",
        s"(sig[2] * 31 + sig[3]) % $BandP AS band_1")

  /** Stored-corpus band index (doc_id, band_idx, band_val) — the
    * persistable table the incremental dedup maintains; build once from
    * the corpus, then both the batch and the streaming novelty filters
    * join against it. */
  def corpusBandIndex(docs: DataFrame, spec: String): DataFrame =
    minhashBands(docs, spec)
      .selectExpr("doc_id", "posexplode(array(band_0, band_1)) AS (band_idx, band_val)")

  /** STREAMING incremental dedup — the novelty filter over an unbounded
    * document stream: a doc is certified novel iff NONE of its bands
    * collide with the stored corpus index. Implemented as two chained
    * stream-static LEFT ANTI joins (one per band), so the stream carries
    * NO state at all — the corpus index is the state, and it lives in a
    * table. Collision docs (the ones filtered out here) are near-dup
    * CANDIDATES; the exact-Jaccard confirm is the batch job's role, so
    * the stream never buffers shingle sets. Sub-shingle-length docs
    * union back in as novel. Append-mode safe: no aggregation, no
    * watermark needed. At scale the static side is re-read per
    * micro-batch, so the index table should be stored bucketed by
    * band_val (co-located join) rather than broadcast — the corpus
    * index of a 100 TB corpus is itself large. */
  def novelDocuments(docs: DataFrame, corpusIndex: DataFrame, spec: String): DataFrame = {
    val bands = minhashBands(docs, spec)
    val idx0 = corpusIndex.filter(col("band_idx") === 0)
      .select(col("band_val").as("cb0")).distinct()
    val idx1 = corpusIndex.filter(col("band_idx") === 1)
      .select(col("band_val").as("cb1")).distinct()
    val shorts = docs.selectExpr("doc_id", "split(text, ' ') AS tokens")
      .filter(size(col("tokens")) < 3).select("doc_id")
    bands
      .join(idx0, col("band_0") === col("cb0"), "left_anti")
      .join(idx1, col("band_1") === col("cb1"), "left_anti")
      .select("doc_id")
      .union(shorts)
  }

  /** Eval-suite band index for [[contaminatedEmbeddings]]: the eval
    * embedding rides alongside each band row so the streaming confirm
    * never joins back for it. Built once from the (small) eval suite
    * and broadcast per micro-batch. */
  def evalBandIndex(evalVecs: DataFrame, bands: Int = 2, bandBits: Int = 8): DataFrame =
    evalVecs.selectExpr("vec_id AS eval_id", "embedding AS eval_emb")
      .selectExpr("eval_id", "eval_emb",
        s"posexplode(graft_lsh_bands(eval_emb, $bands, $bandBits)) AS (band_idx, band_sig)")

  /** STREAMING semantic decontamination — the stream twin of the batch
    * `text_decontam_semantic` core: each incoming embedding is screened
    * against the broadcast eval-suite LSH band index, with the
    * native-cosine ≥ 0.999 confirm in the same projection. Stream-static
    * inner join + filters only — stateless, append-safe, no watermark;
    * the asymmetry that makes the batch query scale (tiny eval side
    * broadcasts, corpus never shuffles) is exactly what makes it
    * streamable. Per-band duplicate hits are NOT deduplicated in-stream
    * (that would need state); the downstream batch aggregate owns
    * dedup, the same contract as [[novelDocuments]]'s candidates. */
  def contaminatedEmbeddings(vecs: DataFrame, evalIndex: DataFrame,
      bands: Int = 2, bandBits: Int = 8): DataFrame =
    vecs.selectExpr("vec_id", "embedding",
        s"posexplode(graft_lsh_bands(embedding, $bands, $bandBits)) AS (band_idx, band_sig)")
      .join(broadcast(evalIndex), Seq("band_idx", "band_sig"))
      .filter(col("vec_id") =!= col("eval_id"))
      .selectExpr("vec_id", "eval_id", "graft_cosine(embedding, eval_emb) AS cos_sim")
      .filter(col("cos_sim") >= 0.999)
      .select(col("vec_id"), col("eval_id"),
        floor(col("cos_sim") * 1000000).cast("long").as("cos_e6"))

  /** STREAMING maintenance of the persisted band index — the WRITE half
    * of the incremental-dedup cycle, composing with [[novelDocuments]]
    * (the read half): each micro-batch of arriving documents upserts
    * its MinHash band signatures into the same versioned
    * [[graft.operators.TableMerge]] table the batch
    * `dedup_index_maintain` maintains, so a stream-fed and a batch-fed
    * index are interchangeable (EventStreamsSpec proves equality after
    * N micro-batches).
    *
    * Scale shape: the index is partitioned by `bucket =
    * pmod(hash(doc_id), nBuckets)` — doc_id determines the partition,
    * so the (bucket, doc_id, band_idx) merge key covers the partition
    * column and TableMerge's partition-scoped path applies: a
    * micro-batch rewrites only its touched buckets, untouched buckets
    * are hard-linked (inodes pinned by the spec). A re-scraped doc's
    * new band values land on its OLD rows in place (same key), so no
    * cross-partition move exists by construction. The novelty join
    * reads band_val, so at 100 TB a band_val-clustered projection
    * would be materialized FROM this table as a separate read-optimized
    * view; the system of record stays doc-keyed so per-batch write cost
    * is O(batch + touched-bucket state), independent of index size. */
  def bandIndexSink(docs: DataFrame, spec: String, tablePath: String,
                    checkpointDir: String,
                    nBuckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          val rows = corpusBandIndex(batch, spec)
            .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))
          TableMerge.upsert(batch.sparkSession, tablePath, rows,
            keys = Seq("bucket", "doc_id", "band_idx"), partitionCols = Seq("bucket"))
        }
      }
      .start()

  /** Per-doc distinct winnowing prints (k-gram winnowed selection,
    * Schleimer et al.) — the batch kernel [[winnowIndexSink]] persists
    * and [[winnowMatches]] probes; identical expressions to the batch
    * battery's `text_winnow_fp`/`dedup_winnow_*` via PipelineShared,
    * so stream and batch cannot drift. */
  def winnowPrintIndex(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    docs.selectExpr("doc_id", "split(text, ' ') AS tokens")
      .filter(size(col("tokens")) >= k + w - 1)
      .withColumn("hashes", expr(graft.queries.PipelineShared.winnowHashesExpr(k)))
      .withColumn("sels", expr(graft.queries.PipelineShared.winnowSelsExpr(w)))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sels, p -> element_at(hashes, p)))")).as("h"))

  /** STREAMING maintenance of the persisted WINNOW-PRINT index — the
    * guaranteed-recall sibling of [[bandIndexSink]]: each micro-batch
    * replaces its documents' print SETS in the doc-hash-bucketed
    * TableMerge table. Unlike band signatures (fixed band_idx slots,
    * update-in-place under the same key), a re-scrape CHANGES THE SET
    * of prints — so the merge is `replaceKeys` with dropGroups = the
    * batch's (bucket, doc_id) pairs: all old prints of re-scraped docs
    * drop, the new set inserts, in ONE partition-scoped commit (quiet
    * buckets hard-link; inodes pinned by the spec). dropGroups derives
    * from the BATCH doc list, not the print rows, so a re-scrape to a
    * too-short text correctly CLEARS the doc's prints. Per-batch cost
    * O(batch + touched-bucket state), independent of index size. */
  def winnowIndexSink(docs: DataFrame, tablePath: String, checkpointDir: String,
                      k: Int = 3, w: Int = 4,
                      nBuckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          // dropDuplicates guards the literal duplicate-row case (the
          // same doc twice in one micro-batch); which TEXT wins for a
          // same-batch re-scrape is the caller's to resolve upstream,
          // the same within-batch contract as every keyed sink here
          val rows = winnowPrintIndex(batch, k, w)
            .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))
            .dropDuplicates("bucket", "doc_id", "h")
          val dropGroups = batch.select("doc_id").distinct()
            .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)))
            .select("bucket", "doc_id")
          TableMerge.replaceKeys(batch.sparkSession, tablePath, rows, dropGroups,
            groupKeys = Seq("bucket", "doc_id"), partitionCols = Seq("bucket"))
        }
      }
      .start()

  /** Probe documents against a winnow-print index (stream-built or
    * batch-built): df-cap the index side (the boilerplate guard of
    * `dedup_winnow_capped`), equi-join on the print, T=1 — any probe
    * doc sharing one uncapped selected print with a corpus doc
    * surfaces, which carries the Schleimer ≥ (w+k−1)-token substring
    * guarantee. Returns (probe_id, corpus_id, shared). */
  def winnowMatches(probe: DataFrame, index: DataFrame, k: Int = 3, w: Int = 4,
                    dfCap: Long = 32L): DataFrame = {
    val census = index.groupBy("h").agg(count(lit(1)).as("df"))
    val cold = index.join(census.filter(col("df") <= dfCap).select("h"), Seq("h"))
    winnowPrintIndex(probe, k, w)
      .select(col("doc_id").as("probe_id"), col("h"))
      .join(cold.select(col("doc_id").as("corpus_id"), col("h")), Seq("h"))
      .groupBy("probe_id", "corpus_id").agg(count(lit(1)).as("shared"))
  }

  /** STREAMING maintenance of the persisted IVF-bucketed ANN index —
    * the stream twin of the batch `sim_index_maintain` (and the vector
    * sibling of [[bandIndexSink]]): each micro-batch of (vec_id,
    * embedding) rows is merged into the centroid-partitioned
    * [[graft.operators.TableMerge]] layout that `ivfProbedTopk`-style
    * reads prune against. Unlike the band index, the partition key
    * (centroid_id) is DERIVED from the value being updated, so a
    * re-embedded vector can MOVE partitions: the merge is
    * `replaceKeys` with dropGroups = old positions (a semi-join of
    * batch ids against the live index) ∪ new positions — TableMerge's
    * partition-scoped path rewrites exactly the touched lists and
    * hard-links the rest.
    *
    * Scale: per-batch cost is O(batch + state in touched centroids +
    * one semi-join against the index keyed by vec_id). At 100 TB the
    * old-position lookup is the one index-sized term — production
    * would keep a (vec_id → centroid) point-lookup table beside the
    * layout (the same TableMerge machinery, vec_id-bucketed); here the
    * semi-join IS that lookup, fused. */
  def vectorIndexSink(vecs: DataFrame, tablePath: String, checkpointDir: String,
                      nlist: Int = 16,
                      compactEvery: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same accretion control as upsertLatestSink: every touched
        // centroid partition gains up to shuffle.partitions files per
        // micro-batch; fold overflowing lists back periodically
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
            graft.operators.TableMerge.exists(tablePath))
          graft.operators.TableMerge.compact(batch.sparkSession, tablePath,
            Seq("centroid_id"), maxFiles = compactEvery / 2)
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          // within-batch duplicates of a vec_id would insert wholesale
          // (two rows, possibly in two centroid partitions) — dedup
          // like every sibling index sink; latest-wins across batches
          // is the replaceKeys below
          val rows = batch.dropDuplicates("vec_id")
            .selectExpr("vec_id", "embedding",
              s"graft_ivf_assign(embedding, $nlist) AS centroid_id")
          if (!TableMerge.exists(tablePath))
            TableMerge.createOrReplace(rows, tablePath, Seq("centroid_id"))
          else {
            val oldPos = TableMerge.read(batch.sparkSession, tablePath)
              .join(rows.select("vec_id"), Seq("vec_id"), "left_semi")
              .select("centroid_id", "vec_id")
            val drops = oldPos.union(rows.select("centroid_id", "vec_id"))
            TableMerge.replaceKeys(batch.sparkSession, tablePath, rows, drops,
              Seq("centroid_id", "vec_id"), Seq("centroid_id"))
          }
        }
      }
      .start()

  /** STREAMING maintenance of the persisted HNSW-style NEIGHBOR TABLE —
    * the graph sibling of [[vectorIndexSink]], completing the index
    * family (band / winnow / vector / graph). Two TableMerge tables:
    * `<path>_vectors` (vec_id-bucketed, latest-wins — the sig side a
    * probe needs) and the edge table (src-bucketed, SCORED rows so
    * touched nodes re-rank without re-scoring).
    *
    * Per micro-batch of (vec_id, embedding):
    *  1. upsert the batch's vectors (replaceKeys on (vbucket, vec_id) —
    *     a re-embed replaces the old row);
    *  2. probe the batch's sigs against the FULL updated sig table for
    *     top-M out-edges (`GraphAnnQueries.outEdges`, never
    *     corpus×corpus);
    *  3. touched srcs = batch nodes ∪ endpoints of new edges ∪ every
    *     node holding an edge INTO a batch node (its stored pair score
    *     is stale after a re-embed);
    *  4. touched nodes' lists rebuild as prune-to-2M over (their kept
    *     edges with non-batch dst) ∪ (new edges both directions) — the
    *     same shrink [[graft.queries.GraphAnnQueries]] documents;
    *     untouched nodes' rows are never read, never rewritten;
    *  5. one partition-scoped replaceKeys commit with dropGroups = the
    *     touched (ebucket, src) pairs — quiet buckets hard-link.
    *
    * First batch degenerates to the full build: no prior edges ⇒
    * touched = everything ⇒ prune2M(sym(outEdges(all, all))) — exactly
    * `edgesDf`. A later batch over an established corpus produces
    * byte-identical edges to the batch `hnswMaintain` audit query
    * (GraphStreamSpec pins both). Per-batch cost: one SCAN of the sig
    * table (the probe's index side — lazy off parquet, never
    * re-materialized; r18 removed the full-corpus localCheckpoints
    * that made each batch O(graph) in executor storage) + shuffles and
    * state REWRITES that track the batch and its touched buckets only;
    * at 100 TB, band-bucketing the sig table adds partition pruning to
    * the probe scan. */
  def graphIndexSink(vecs: DataFrame, tablePath: String, checkpointDir: String,
                     bits: Int = 8,
                     nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          import graft.queries.GraphAnnQueries._
          val s = batch.sparkSession
          val vecPath = s"${tablePath}_vectors"
          val rows = batch.select("vec_id", "embedding")
            .dropDuplicates("vec_id")
            .withColumn("vbucket", pmod(col("vec_id"), lit(nBuckets)))
            .localCheckpoint()
          if (!TableMerge.exists(vecPath))
            TableMerge.createOrReplace(rows, vecPath, Seq("vbucket"))
          else
            TableMerge.replaceKeys(s, vecPath, rows,
              rows.select("vbucket", "vec_id"),
              Seq("vbucket", "vec_id"), Seq("vbucket"))
          // the sig table reads LAZILY off the committed parquet (it is
          // already stable storage — a localCheckpoint here would
          // re-materialize the FULL corpus into executor block storage
          // every micro-batch, an O(corpus) per-batch cost the sink's
          // contract forbids); the probe's index side is one corpus
          // SCAN, and the banded join shuffles only bucket-matched
          // candidates (at 100 TB, band-bucket the sig table for
          // partition pruning on top)
          val allSig = sigOf(
            TableMerge.read(s, vecPath).select("vec_id", "embedding"), bits)
          val batchSig = allSig
            .join(rows.select("vec_id"), Seq("vec_id"), "left_semi")
          val no = outEdges(batchSig, allSig, bits).localCheckpoint()
          val batchIds = rows.select("vec_id")
          // lazy over the live edge snapshot: only the TOUCHED subset
          // materializes below — checkpointing the whole table was the
          // other O(graph) per-batch term
          val existing =
            if (TableMerge.exists(tablePath))
              TableMerge.read(s, tablePath).select("src", "dst", "pair_e6")
            else s.emptyDataset(org.apache.spark.sql.Encoders
              .product[(Long, Long, Long)]).toDF("src", "dst", "pair_e6")
          val staleSrcs = existing
            .join(batchIds.withColumnRenamed("vec_id", "dst"), Seq("dst"),
              "left_semi")
            .select("src")
          val touched = batchIds.select(col("vec_id").as("src"))
            .union(no.select("src"))
            .union(no.select(col("dst").as("src")))
            .union(staleSrcs)
            .distinct().localCheckpoint()
          // keep a touched node's edges only where NEITHER endpoint is a
          // batch node: a re-embed stales every score involving it, both
          // the edges INTO it (dst anti-join) and its own old out-list
          // (src anti-join) — its fresh list comes from `no` ∪ rev(`no`).
          // CHECKPOINTED (it is O(touched state), small): the commit
          // below replaces the snapshot this lineage reads
          val kept = existing
            .join(touched, Seq("src"), "left_semi")
            .join(batchIds.withColumnRenamed("vec_id", "dst"), Seq("dst"),
              "left_anti")
            .join(batchIds.withColumnRenamed("vec_id", "src"), Seq("src"),
              "left_anti")
            .select("src", "dst", "pair_e6")
            .localCheckpoint()
          val rebuilt = prune2M(
            kept.unionByName(no)
              .unionByName(no.select(col("dst").as("src"),
                col("src").as("dst"), col("pair_e6")))
              .distinct())
            .withColumn("ebucket", pmod(col("src"), lit(nBuckets)))
          TableMerge.replaceKeys(s, tablePath, rebuilt,
            touched.select(pmod(col("src"), lit(nBuckets)).as("ebucket"),
              col("src")),
            Seq("ebucket", "src"), Seq("ebucket"))
        }
      }
      .start()

  /** STREAMING BPE tokenization — the tokenizer-apply half of the
    * relational BPE operator run on an unbounded document stream: the
    * TRAINED merge table (a small driver-side artifact, the thing a
    * tokenizer ships — `BpeQueries.learnMerges`) is replayed as chained
    * per-row HOF projections, so the IDENTICAL code tokenizes a static
    * frame and a stream, including words never seen in training (the
    * merges apply to their characters the same way — no vocab lookup,
    * no state). Output is per-doc (doc_id, n_words, n_bpe_tokens)
    * rows, one per input doc — append-safe, stateless, no watermark;
    * downstream aggregation (packing, token budgeting) owns any
    * windowing. */
  def bpeTokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var df = docs.selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "explode(ws) AS w")
      .filter(col("w") =!= "")
      .withColumn("t", split(col("w"), ""))
    merges.foreach { case (l, r) =>
      df = graft.queries.BpeQueries.applyMergeRound(df, l, r)
    }
    df.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("t"))).cast("long").as("n_bpe_tokens"))
  }

  /** STREAMING mini-batch k-means — incremental quantizer re-training
    * over an unbounded embedding stream ([[graft.operators.
    * MiniBatchKmeans]]): each micro-batch folds into the persisted
    * centroid state (a tiny k-row TableMerge table: cid, e6
    * components, accumulated count) as an exact integer running mean,
    * so a stream of batches and a batch replay of the same sequence
    * produce IDENTICAL centroids. Completes the ANN lifecycle next to
    * [[vectorIndexSink]]: the index holds the vectors, this holds the
    * quantizer the index is bucketed by; when `sim_index_drift` says
    * the lists have drifted, the freshest centroids are already here.
    *
    * The count-weighted running mean is NOT idempotent — a replayed
    * batch would fold the same points in twice — so each commit rides
    * the [[StreamLineage]] exactly-once protocol (batch tag + run
    * nonce, the CmsStream discipline): a replay within the lineage is
    * a no-op, a reset checkpoint over kept centroids fails loudly. */
  private[graft] val KmeansBatchKey = "graft.kmeans.batch"
  private[graft] val KmeansRunKey = "graft.kmeans.run"

  def kmeansUpdateSink(vecs: DataFrame, tablePath: String, checkpointDir: String,
                       k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val runId = StreamLineage.runIdFor(checkpointDir)
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyKmeansBatch(batch, batchId, tablePath, k, runId)
      }
      .start()
  }

  /** The per-micro-batch apply, factored out so the replay protocol is
    * testable without crashing a real query (the CmsStream shape). */
  private[graft] def applyKmeansBatch(batch: DataFrame, batchId: Long,
      tablePath: String, k: Int, runId: String): Unit = {
    import graft.operators.{MiniBatchKmeans, TableMerge}
    val (foreign, already) = StreamLineage.replayState(
      tablePath, KmeansBatchKey, KmeansRunKey, batchId, runId)
    StreamLineage.requireSameLineage("k-means centroid", tablePath, foreign, runId)
    if (!batch.isEmpty && !already) {
      val s = batch.sparkSession
      import s.implicits._
      val current: MiniBatchKmeans.Cents =
        if (TableMerge.exists(tablePath))
          TableMerge.read(s, tablePath)
            .select("centroid_id", "cvec", "n")
            .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq
        else MiniBatchKmeans.gridInit(k)
      val next = MiniBatchKmeans.step(batch, current)
      TableMerge.createOrReplace(
        next.toDF("centroid_id", "cvec", "n"), tablePath,
        meta = Map(KmeansBatchKey -> batchId.toString, KmeansRunKey -> runId))
    }
  }

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, last_ts: Timestamp)

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * count + last-seen timestamp (the streaming analogue of the
    * latest-wins W1 window). State is one tiny record per user —
    * watermark-free ProcessingTimeTimeout keeps it simple here; a
    * production deployment would add a timeout policy. */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val events = batch.toSeq
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, new Timestamp(0L)))
          val lastTs = (events.map(_.ts) :+ prev.last_ts).maxBy(_.getTime)
          val next = UserRunning(userId, prev.n_events + events.size, lastTs)
          state.update(next)
          next
      }
  }

  final case class DistinctRunning(event_type: String, approx_users: Long)

  /** Streaming approximate distinct-count via the mergeable HLL sketch
    * ([[graft.expressions.HllSketch]]) as mapGroupsWithState state: the
    * unbounded-stream operation exact countDistinct fundamentally
    * cannot do — exact distinct state grows with the number of distinct
    * keys ever seen, while the sketch holds a FIXED 2^p bytes per group
    * forever (4 KB at p=12 for ~1.6% error at any cardinality). Each
    * micro-batch folds its user_ids into the stored registers and emits
    * the refreshed estimate; register max is idempotent, so re-delivered
    * events cannot inflate the count (dedup-free exactly-once-ish for
    * this metric). The state bytes are the SAME serialized sketch the
    * batch `graft_hll_agg` emits — a snapshot could be exported to a
    * sketch table and re-merged with batch sketches, and
    * EventStreamsSpec proves stream-vs-batch estimate equality. */
  def approxDistinctUsers(events: Dataset[Event], p: Int = 12): Dataset[DistinctRunning] = {
    import events.sparkSession.implicits._
    import graft.expressions.HllSketch
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Array[Byte], DistinctRunning](GroupStateTimeout.NoTimeout) {
        (etype: String, batch: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](HllSketch.numRegisters(p)))
          batch.foreach(e => HllSketch.add(regs, p, e.user_id))
          state.update(regs)
          DistinctRunning(etype, HllSketch.estimate(regs))
      }
  }

  /** Stream-stream INTERVAL join (the streaming twin of the J17 range
    * join): signup events joined to error events of the same user inside
    * (signup_ts, signup_ts + windowSec]. Both sides carry watermarks and
    * the join condition bounds event-time distance, so Spark can expire
    * buffered state on both sides — without the time-range predicate a
    * stream-stream join buffers FOREVER. At scale the state store holds
    * one watermark-window of each side per shuffle partition, keyed by
    * user_id (same shuffle key as the batch twin). */
  def intervalJoin(signups: DataFrame, errors: DataFrame,
                   windowSec: Long = 6 * 3600L,
                   watermark: String = "1 day"): DataFrame = {
    val s = signups.withWatermark("ts", watermark)
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("s_ts"))
    val e = errors.withWatermark("ts", watermark)
      .select(col("event_id").as("error_id"), col("user_id").as("e_user_id"),
        col("ts").as("e_ts"))
    s.join(e,
      col("user_id") === col("e_user_id") &&
        col("e_ts") > col("s_ts") &&
        col("e_ts") <= col("s_ts") + expr(s"INTERVAL $windowSec SECOND"),
      "inner")
      .select(col("signup_id"), col("error_id"), col("user_id"), col("s_ts"), col("e_ts"))
  }

  /** Incremental MERGE sink: each micro-batch folds into a persistent
    * latest-wins-per-user table through
    * [[graft.operators.TableMerge.upsert]] — the streaming face of the
    * K1 sink (the reference's batch CDC merge, `transformer.py:
    * 2427-2458`, fed continuously; `elasticsearch_sync.py:364-371` is
    * the driver-side loop this replaces).
    *
    * Per-batch cost is O(batch), not O(accumulated state): the state
    * table is partitioned by `bucket = pmod(hash(user_id), nBuckets)`,
    * the micro-batch's touched buckets are collected (≤ nBuckets ints),
    * the latest-wins fold reads ONLY those partitions (static isin
    * pruning at the parquet scan), and the merge runs through
    * TableMerge's partition-scoped path — untouched buckets are
    * hard-linked into the new version, never read or rewritten. A
    * micro-batch touching k buckets costs O(batch + state-in-k-buckets)
    * regardless of total state size.
    *
    * Latest-wins is by EVENT time (ts, then event_id): the current
    * rows of touched buckets join the batch before the per-user
    * row_number dedup, so a late micro-batch carrying an older event
    * never clobbers newer state. Exactly-once comes from the idempotent
    * merge (re-delivered rows upsert to the same state). */
  def upsertLatestSink(events: DataFrame, tablePath: String,
                       checkpointDir: String,
                       nBuckets: Int = 64,
                       compactEvery: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.TableMerge
        // cap small-file fragmentation: a bucket rewrite emits one file
        // per merge-shuffle task that held its rows (up to
        // shuffle.partitions files per hot bucket, every batch); every
        // compactEvery batches, overflowing buckets fold to one file.
        // The CAS commit means a concurrent reader or a racing writer
        // never sees a half state.
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
            TableMerge.exists(tablePath))
          TableMerge.compact(batch.sparkSession, tablePath, Seq("bucket"),
            maxFiles = compactEvery / 2)
        if (!batch.isEmpty) {
          val bucketed = batch.withColumn(
            "bucket", pmod(hash(col("user_id")), lit(nBuckets)))
          // bounded by construction: ≤ nBuckets distinct values
          val touched = bucketed.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          val base =
            if (TableMerge.exists(tablePath))
              bucketed.unionByName(
                TableMerge.read(batch.sparkSession, tablePath)
                  .filter(col("bucket").isin(touched: _*))
                  .select(bucketed.columns.map(col): _*))
            else bucketed
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("ts").desc, col("event_id").desc)
          val latest = base
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
          TableMerge.upsert(batch.sparkSession, tablePath, latest,
            keys = Seq("bucket", "user_id"), partitionCols = Seq("bucket"))
        }
      }
      .start()

  /** STREAMING incremental MATERIALIZED-VIEW maintenance driven by the
    * snapshot CHANGE FEED — the streaming composition of the batch
    * `k11_change_feed` (version diff) and `i8_matview_delta` (monoid
    * fold): each micro-batch of facts (event_id, user_id, value_e2)
    * (a) upserts into the BASE TableMerge table keyed event_id, then
    * (b) derives the batch's exact change feed as post-version minus
    * pre-version restricted to the touched keys, and (c) folds the
    * signed per-user delta into the VIEW table. Deriving the delta
    * from the version diff — not from the input batch — is what makes
    * RE-DELIVERED and UPDATED facts correct: an event_id arriving
    * again with a new value contributes (new − old), not (+new), so
    * the view never double-counts. Count and sum are commutative-group
    * aggregates (signed deltas cancel), the algebraic requirement for
    * this maintenance.
    *
    * Scale: per batch, one upsert touching O(batch) keys, two
    * key-restricted snapshot reads (post and retained pre — both
    * semi-joined down to batch keys), and a view upsert touching
    * O(users in batch) rows. Nothing scans the full base table.
    * Within-batch duplicates of a key are the caller's to resolve
    * (dedup upstream); across batches re-delivery is the supported
    * path.
    *
    * Exactly-once under at-least-once replay (the Delta txn-appId
    * pattern over TableMerge commit metadata): foreachBatch may
    * re-deliver a batch after a partial failure, and the dangerous
    * replay is "base upsert committed, view upsert didn't" — naively
    * re-diffing then yields pre == post, delta 0, and the view loses
    * the batch forever. So (a) the base commit is TAGGED with its
    * batchId and the pre-version it diffed against, atomically with
    * the data; a replay that finds its batchId already on a base
    * commit skips the upsert and re-derives the SAME delta from the
    * recorded (pre, post) pair; (b) the view commit is tagged with
    * the batchId it applied; a replay that finds the view already at
    * this batchId is a full no-op. Retention bounds the replay
    * window (one prior version + the prune grace); a stale replay
    * whose recorded pre-version was expired fails loudly
    * (readVersion require) instead of silently zeroing the delta.
    * Single-writer per base/view path (the streaming query owns its
    * tables — checkpointed queries are already serial per sink). */
  /** Commit-metadata keys for [[matviewDeltaSink]]'s exactly-once
    * protocol (namespaced so unrelated writers to the same table can
    * carry their own tags). */
  private[graft] val MatviewBatchKey = "graft.matview.batch"
  private[graft] val MatviewPreKey = "graft.matview.pre"
  private[graft] val MatviewRunKey = "graft.matview.run"

  def matviewDeltaSink(facts: DataFrame, basePath: String, viewPath: String,
                       checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val runId = StreamLineage.runIdFor(checkpointDir)
    facts.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMatviewBatch(batch, batchId, basePath, viewPath, runId)
      }
      .start()
  }

  /** The per-micro-batch apply of [[matviewDeltaSink]], factored out so
    * the replay protocol is testable without crashing a real query:
    * calling it twice with the same batchId — or after a simulated
    * partial failure (base committed, view not) — must yield the same
    * view as one clean apply. The batch-tag skip is scoped to ONE
    * checkpoint lineage via `runId` ([[StreamLineage]]): a reset
    * checkpoint over kept base/view tables restarts batchIds at 0, and
    * an unscoped `>= batchId` would silently drop every new batch
    * (and an unscoped base-tag lookup could replay an ancient
    * lineage's recorded delta) — a foreign lineage fails loudly
    * instead. */
  private[graft] def applyMatviewBatch(batch: DataFrame, batchId: Long,
                                       basePath: String, viewPath: String,
                                       runId: String): Unit = {
        val alreadyApplied = {
          // Scan ALL retained view commits, not just the live one
          // (ADVICE r13): an untagged commit between apply and replay —
          // a second writer, a manual repair — would otherwise hide the
          // applied batch's tag and the delta would be double-applied.
          // >= comparison: a later batch's tag also proves this one ran.
          val (foreignView, already) = StreamLineage.replayState(
            viewPath, MatviewBatchKey, MatviewRunKey, batchId, runId)
          StreamLineage.requireSameLineage("matview", viewPath, foreignView, runId)
          val (foreignBase, _) = StreamLineage.replayState(
            basePath, MatviewBatchKey, MatviewRunKey, batchId, runId)
          StreamLineage.requireSameLineage("matview base", basePath, foreignBase, runId)
          already
        }
        if (!batch.isEmpty && !alreadyApplied) {
          import graft.operators.TableMerge
          val s = batch.sparkSession
          val bid = batchId.toString
          val rows = batch.select("event_id", "user_id", "value_e2")
          // Resolve (pre, post) for THIS batch: replay-aware. A base
          // commit already tagged with bid means the upsert happened on
          // a previous attempt — reuse its recorded pre instead of
          // diffing head-vs-head (which would be zero).
          val (preVersion, postVersion) =
            TableMerge.findVersionByMeta(basePath, MatviewBatchKey, bid) match {
              case Some(tagged) =>
                (TableMerge.versionMeta(basePath, tagged).get(MatviewPreKey), tagged)
              case None =>
                val pre =
                  if (TableMerge.exists(basePath)) TableMerge.versions(basePath).headOption
                  else None
                val tag = Map(MatviewBatchKey -> bid, MatviewRunKey -> runId) ++
                  pre.map(MatviewPreKey -> _)
                if (pre.isDefined)
                  TableMerge.upsert(s, basePath, rows, Seq("event_id"), meta = tag)
                else TableMerge.createOrReplace(rows, basePath, meta = tag)
                (pre, TableMerge.findVersionByMeta(basePath, MatviewBatchKey, bid)
                  .getOrElse(sys.error(s"matview base commit for batch $bid not found")))
            }
          val keys = rows.select("event_id").distinct()
          val postTouched = TableMerge.readVersion(s, basePath, postVersion)
            .join(keys, Seq("event_id"))
          val preTouched = preVersion match {
            case Some(v) => TableMerge.readVersion(s, basePath, v).join(keys, Seq("event_id"))
            case None    => postTouched.limit(0)
          }
          def signed(df: DataFrame, sign: Int): DataFrame = df
            .groupBy("user_id")
            .agg(count(lit(1)).as("cnt"), sum("value_e2").as("sv"))
            .select(col("user_id"), (col("cnt") * sign).as("d_n"), (col("sv") * sign).as("d_sum"))
          val delta = signed(postTouched, 1).unionByName(signed(preTouched, -1))
            .groupBy("user_id")
            .agg(sum("d_n").as("d_n"), sum("d_sum").as("d_sum"))
          val cur =
            if (TableMerge.exists(viewPath)) TableMerge.read(s, viewPath)
            else delta.limit(0).select(col("user_id"),
              col("d_n").as("n"), col("d_sum").as("sum_value_e2"))
          val updated = delta.alias("d").join(cur.alias("c"), Seq("user_id"), "left")
            .select(col("user_id"),
              (col("d.d_n") + coalesce(col("c.n"), lit(0L))).as("n"),
              (col("d.d_sum") + coalesce(col("c.sum_value_e2"), lit(0L))).as("sum_value_e2"))
          val viewTag = Map(MatviewBatchKey -> bid, MatviewRunKey -> runId)
          if (TableMerge.exists(viewPath))
            TableMerge.upsert(s, viewPath, updated, Seq("user_id"), meta = viewTag)
          else TableMerge.createOrReplace(updated, viewPath, meta = viewTag)
        }
  }

  /** Native `session_window` aggregate — the built-in sessionization
    * the batch battery pins via `w5_session_window`, exposed as the
    * usual source-free transform so the IDENTICAL plan runs bounded or
    * unbounded: under `readStream` + this watermark, Spark keeps one
    * merging session state per (user, open window) and emits a session
    * in append mode once the watermark passes its end — the managed
    * alternative to the hand-rolled flatMapGroupsWithState
    * [[sessionize]] (which remains the pin for custom 0..n-emission
    * semantics the built-in cannot express). State is bounded by
    * watermark × active users, shuffle key user_id — same as every
    * batch job. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("event_id").as("sum_event_id"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_event_id"))

  /** STREAMING SCD TYPE-2 apply — the stream twin of the batch
    * `i9_scd2_history`: each micro-batch of feed rows
    * (key, attr, eff) diffs against the dimension's CURRENT rows by
    * real attribute compare; new keys open a row, changed keys close
    * the current row in place (valid_to = the feed row's effective
    * date) and open a new one, unchanged keys are untouched. All three
    * row classes land in ONE TableMerge upsert keyed
    * (key, valid_from) — a single copy-on-write commit per batch, so a
    * point-in-time reader never sees a half-applied day. Per-batch
    * cost is O(batch + current rows of touched keys); history size
    * never enters the merge. Within-batch duplicates of a key are the
    * caller's to resolve (one effective row per key per batch).
    *
    * Change detection is NULL-SAFE (`<=>`): an attr transitioning to
    * or from NULL is a real change and must version, where a naive
    * `=!=` evaluates to NULL and silently drops the update. And the
    * no-gap/no-overlap invariant point-in-time consumers rely on
    * (exactly one row with valid_from <= as_of < valid_to) requires
    * effective dates to move FORWARD per key: a feed row with
    * eff <= the current row's valid_from would close the current row
    * before it opened and create an overlapping version, so such
    * out-of-order rows are rejected (filtered) — late history
    * restatement is a batch rebuild concern, not a streaming-apply
    * one. */
  def scd2Sink(feed: DataFrame, dimPath: String,
               checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.TableMerge
          val s = batch.sparkSession
          val rows = batch.select("key", "attr", "eff")
          // valid_to types as eff's OWN type: closed rows set it to the
          // effective date, and a hardcoded string here would silently
          // widen a DATE/TIMESTAMP-typed feed's valid_to to STRING in
          // the unionByName below (valid_from date, valid_to string —
          // point-in-time range predicates then hit implicit casts)
          val effType = rows.schema("eff").dataType
          def open(src: DataFrame, attr: org.apache.spark.sql.Column): DataFrame =
            src.select(col("key"), attr.as("attr"), col("eff").as("valid_from"),
              lit(null).cast(effType).as("valid_to"), lit(true).as("is_current"))
          if (!TableMerge.exists(dimPath)) TableMerge.createOrReplace(open(rows, col("attr")), dimPath)
          else {
            val current = TableMerge.read(s, dimPath).filter(col("is_current"))
            val j = rows.alias("f").join(current.alias("c"), Seq("key"), "left")
            val newRows = open(j.filter(col("c.valid_from").isNull), col("f.attr"))
            val changed = j.filter(col("c.valid_from").isNotNull &&
              !(col("f.attr") <=> col("c.attr")) &&
              col("eff") > col("c.valid_from"))
            val closed = changed.select(col("key"), col("c.attr").as("attr"),
              col("c.valid_from").as("valid_from"), col("eff").as("valid_to"),
              lit(false).as("is_current"))
            val opened = open(changed, col("f.attr"))
            TableMerge.upsert(s, dimPath,
              newRows.unionByName(closed).unionByName(opened),
              Seq("key", "valid_from"))
          }
        }
      }
      .start()

  final case class SessionState(start: Timestamp, last: Timestamp, n_events: Long)

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, duration_sec: Long)

  /** Sessionization via flatMapGroupsWithState (the 0-or-many-outputs
    * variant of keyed state): events within `gapSec` of each other
    * extend a user's open session; a larger gap CLOSES the session and
    * emits it, then opens a new one — the canonical 0..n-rows-per-group
    * case mapGroupsWithState cannot express. Event-time-timeout closes
    * idle sessions when the watermark passes the gap, bounding state at
    * one open session per active user (at 100 TB the shuffle key is
    * user_id, same as the batch jobs; state size is O(active users)).
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 watermark: String = "1 day"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the session gap: close and emit
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.start, s.last, s.n_events,
              (s.last.getTime - s.start.getTime) / 1000L))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
                  // a watermark-admitted late event can predate the open
                  // session (negative delta passes the gap check): extend
                  // with min/max so start/last never move backward/forward
                  // wrongly — naive `last = e.ts` shrank the session and
                  // could emit negative durations
                  open = Some(SessionState(
                    new Timestamp(math.min(s.start.getTime, e.ts.getTime)),
                    new Timestamp(math.max(s.last.getTime, e.ts.getTime)),
                    s.n_events + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start, s.last, s.n_events,
                    (s.last.getTime - s.start.getTime) / 1000L)
                  open = Some(SessionState(e.ts, e.ts, 1L))
                case None =>
                  open = Some(SessionState(e.ts, e.ts, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
