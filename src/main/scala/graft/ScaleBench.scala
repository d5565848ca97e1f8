package graft

import org.apache.spark.sql.functions._

/** Scale-slope evidence for the dedup/ANN tier (VERDICT r8 #6): no sf1
  * testdata exists, so synthesize ×1 and ×8 corpora from the base sf dir
  * and measure how the candidate-generating queries scale. The thing to
  * prove is that candidate-pair volume — the term that goes quadratic in
  * a naive all-pairs design — stays bounded by the band/bucket structure,
  * i.e. wall time and pair counts grow ~linearly with corpus size.
  *
  * Corpus construction: documents are unioned `f`× with doc_id offsets
  * of 1M per copy (clear of every fixture's +100k/+200k injected-dup id
  * ranges). Copy 0 keeps the original text; copy i>0 prefixes EVERY
  * token with `c<i>`, making its shingle vocabulary disjoint from every
  * other copy — cross-copy Jaccard is ~0, so each copy contributes its
  * own near-dup structure and the TRUE pair count scales ×f (a
  * first-token-only perturbation would leave copies ~0.99-similar to
  * each other and grow pairs O(f²) BY CONSTRUCTION, which would measure
  * the fixture, not the engine). Embeddings are unioned with vec_id
  * offsets and the vector rotated by i positions per copy — rotation
  * changes direction (cosine), not norm, so copies don't collapse into
  * one ANN bucket.
  *
  * Output: one JSON line + BENCH_scale.json with per-query seconds at
  * ×1/×8 (and ×32 for the steep-slope DeepQueries), the time ratios,
  * and the observed band-bucket stats (candidate pairs before distinct,
  * max bucket size) for the minhash-pairs pipeline at both base scales.
  */
object ScaleBench {

  private val Factors = Seq(1, 8)

  /** The r9-measured steep-slope queries (×8 ratios 1.67-2.44) plus the
    * curation funnel get one more factor: ×32 (VERDICT r9 #6). The first
    * ×32 run MEASURED the banded-LSH pipelines compounding at their fixed
    * 8-bit battery width — t×32/t×8 = 34.7 (semantic keep) / 15.4 (embed
    * near-dup) against only 4× more data, exactly the quadratic
    * bucket-occupancy regime the documented `bandBits ∝ log2 N` law
    * predicts. Applying the uniform-data rule of thumb (+1 bit per
    * corpus doubling: 8/11/13) was NOT enough — this corpus is CLUSTERED
    * (rotated copies of an IVF-structured base), the lattice hyperplanes
    * split tight clusters weakly, and candidate pairs per row still grew
    * 17.6 → 52 → 115. Measured occupancy says this corpus costs ~2-3
    * bits per doubling (8/14/20 holds ~18-20 pairs/row flat). So the
    * deep tier does what production does: a cheap band-bucket CENSUS
    * (one partial aggregate over the signatures) picks the smallest
    * width whose candidate volume per row is ~constant, and the timed
    * runs use that width. One fixed-8-bit ×32 point stays as the
    * measured record of what ignoring the lever costs; census seconds
    * are reported separately as the tuning cost. */
  private val DeepFactor = 32
  private val DeepQueries = Seq(
    "dedup_semantic_keep", "sim_embed_neardup", "sim_ivf_topk", "e2e_curation_funnel",
    // r13 additions (VERDICT r12 #9): the partition-scoped lifecycle ops
    // whose ×32 slope substantiates the "cost tracks the batch/partition,
    // not the table" claims — index maintenance, BPE training (distinct
    // vocab grows ~×f), partition overwrite restatement — plus the
    // df-capped winnow join whose candidate volume the cap must hold
    // ~linear under the ×32 corpus (VERDICT r12 #3)
    "sim_index_maintain", "text_bpe_merges", "k12_partition_overwrite",
    "dedup_winnow_capped",
    // r15: the graph-ANN build (k-NN edge table) and its incremental
    // batch insert — both banded-LSH candidate joins whose width is the
    // same census lever; at fixed 8 bits the build's candidate volume is
    // N²/2⁸-shaped, so the deep tier runs them at the census width only
    "sim_hnsw_topk", "sim_hnsw_maintain",
    // r16 (VERDICT r15 #4): the IVF probed reads at the census-tuned
    // width, through the bucketed layout — the battery's fixed-16
    // in-query-assignment rows stay in Queries as the record of what
    // ignoring the lever costs (×8 ratios 2.67/2.77 at r15); here the
    // write-time assignment is billed with the census and the timed
    // query is the partition-pruned probe whose row volume the tuner
    // holds flat
    "sim_ivfpq_topk",
    // r15: the batched multi-query walk and the two-level descent —
    // both are graph BUILDS first (banded joins, same width lever);
    // the walks themselves are bounded at any width
    "sim_hnsw_batch", "sim_hnsw_hier",
    // r17 (VERDICT r16 #1): the persisted-index retrain lifecycle at
    // the census width — the maintain row above also switches to the
    // census width here (the battery row keeps the oracle-replayable
    // √N width as its record)
    "sim_index_retrain")

  /** The two width-lever pipelines also get the fixed-width ×32 point. */
  private val FixedWidthDoc = Seq("dedup_semantic_keep", "sim_embed_neardup")

  /** One more doubling for the skew-capped families (VERDICT r18 #8):
    * `dedup_winnow_capped` (×32/×8 = 3.59) and `sim_embed_neardup`
    * (3.25 at census widths) sat near the linear boundary at ×32 — the
    * ×64 point adjudicates whether the df-cap/census keeps them
    * sub-linear per row or ×32 was the knee. Run at the ×64 census
    * width (embed) / the battery cap (winnow), with the winnow df
    * census re-priced at ×64. */
  private val X64Factor = 64
  /** r20 adds `dedup_containment_incr` (VERDICT r19 #7): ×32/×8 = 1.99
    * made it the next-steepest capped family; both factors run through
    * the isolated-JVM channel like winnow. */
  private val X64Queries =
    Seq("dedup_winnow_capped", "sim_embed_neardup", "dedup_containment_incr")

  /** The same corpus the near-dup pipelines build (base + injected
    * exact copies), fed to [[graft.operators.LshTuner]] for the census. */
  private def neardupCorpus(spark: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    base.select(col("vec_id"), col("embedding"))
      .union(base.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  private val Queries = Seq(
    "dedup_exact", "dedup_simhash", "dedup_simhash_pairs", "dedup_simhash_multiprobe",
    "dedup_minhash_lsh", "dedup_minhash_pairs",
    "dedup_incremental", "dedup_ngram_jaccard", "dedup_connected_components",
    "dedup_span_coverage", "dedup_novel_filter", "dedup_semantic_keep",
    "sim_lsh_buckets", "sim_ivf_topk", "sim_ivfpq_topk", "sim_ivfpq_rerank",
    "sim_embed_neardup", "e2e_curation_funnel",
    // fixed probe set (copy-0 doc_ids) against a ×f corpus — the
    // decontamination scale story: the Bloom build cost is constant
    // while the prefiltered corpus side grows linearly
    "text_decontam_bloom",
    // r12 additions: persisted ANN-index maintenance (create+merge is a
    // partition-scoped rewrite — cost tracks the batch, not the index),
    // relational BPE (trains on the DISTINCT vocab, which grows ~xf here
    // because each copy's prefixed words are new), the MinHash band-shape
    // census (one partial-agg pass per shape), and PNG pixel decode
    // (embarrassingly parallel mapPartitions CPU)
    "sim_index_maintain", "text_bpe_tokens", "dedup_band_census", "mm_pixel_stats",
    // integer-space k-means (3 assigns + 2 driver syncs — each a
    // broadcast-scan), bigram LM scoring (two count aggs + equi-joins),
    // and the funnel-BPE-pack composition
    "sim_kmeans_train", "text_bigram_logprob", "e2e_token_budget",
    // r12 batch 2: symspell fuzzy join (vocab grows ~xf since each
    // copy's prefixed words are new — the deletion-neighborhood
    // expansion is O(sum of word lengths), the join a hash shuffle on
    // the variant), winnowing fingerprints (pure per-row projection),
    // the histogram-sketch rollup (state O(sources x buckets), constant
    // in rows), and WAV PCM decode (mapPartitions CPU, no shuffle)
    "dedup_symspell_join", "text_winnow_fp", "agg_hist_quantile", "mm_audio_stats",
    // r12 batch 3: the winnow pair join (hash-keyed candidate join,
    // bucket-bounded), the per-source corpus card (four per-source
    // aggregates + a digest census — all single-shuffle), and the RAG
    // assembly (broadcast-stats scan + constant-size pack)
    "dedup_winnow_pairs", "e2e_corpus_card", "search_rag_context",
    // r13: the skew-capped fingerprint joins (VERDICT r12 #3) and the
    // funnel with the near-dup stage (VERDICT r12 #1 — the added cost
    // is one band shuffle over exact-unique survivors + the
    // bucket-bounded candidate join)
    "dedup_winnow_capped", "dedup_symspell_capped", "e2e_curation_funnel_v2",
    // r13: the full drift->retrain->rebuild lifecycle (kmeans pass +
    // one partitioned rewrite — the expensive branch, priced honestly)
    "sim_index_retrain",
    // r13 batch 2: containment inverted join (df-capped shingle key),
    // subspace-keyed PQ training, the 1/2/3-gram+KN LM family's new
    // rungs (n-gram count aggs + equi-joins), perplexity bucketing
    // (per-source window), MMR (corpus side is one broadcast-stats
    // scan; the walk is O(1)), norm census, GIF decode (mapPartitions
    // CPU), and the Zipf head (heap top-k + broadcast rank)
    "dedup_containment", "sim_pq_train", "text_trigram_logprob",
    "text_kn_logprob", "text_ppl_buckets", "search_rag_mmr",
    "sim_norm_census", "mm_pixel_stats_gif", "text_zipf_census",
    // r13 batch 3: asymmetric batch⋈index containment (the daily-crawl
    // shape), trigram entropy (one n-gram agg), histogram KL (constant
    // state), and the kmeans+keyword topic census
    "dedup_containment_incr", "text_ngram_entropy", "text_dist_drift",
    "e2e_topic_census", "mm_pixel_stats_jpeg",
    // r15: real MP4 sample demux (mapPartitions CPU, no shuffle until
    // the final sort — the same embarrassingly-parallel shape as the
    // pixel decodes)
    "mm_mp4_samples",
    // r15 batch 2: the batched multi-query beam walk (one graph build +
    // NQ simultaneous frontiers — the serving-throughput claim), the
    // two-level descent (builds BOTH layers' graphs — the build is the
    // cost, the walks are bounded), OPQ training (variance census +
    // two subspace trainers, all broadcast-scan), the shortlist rerank
    // (hybrid scan + feature join on ≤100 rows), the windowed-span
    // recall audit (its exact side is the bucketed 12-gram join), the
    // NB classifier (two count aggs + a word-keyed scoring join), the
    // shard-plan census (one byte aggregate + bin windows), and the
    // waterfill allocator (one token aggregate + domain-sized windows)
    "sim_opq_train", "search_rerank",
    "dedup_span_recall", "text_nb_classifier", "export_shard_plan",
    "sample_budget_alloc", "mm_audio_vad",
    // r15 batch 3: the trained-selection tier — DSIR (two 64-key count
    // aggs + a broadcast weight join), the batch perceptron (Epochs ×
    // two checkpointed-feature scans — the slope prices the iterative
    // loop), the CMS sketch (one fixed-size aggregate), the curriculum
    // global rank (bin windows + broadcast offsets), and the BPE
    // fertility census (vocab join + per-source agg)
    "sample_dsir", "text_perceptron", "agg_cms_estimate",
    "sample_curriculum", "text_bpe_fertility")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local("graft-scale")
    // warm codegen/JIT the same way Bench does
    spark.range(1000000).selectExpr("sum(id)").collect()

    val dirs: Map[Int, String] = (Factors :+ DeepFactor :+ X64Factor).map { f =>
      val dir = new java.io.File(s"target/graft-state/scale_x$f").getAbsolutePath
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val embs = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until f).map { i =>
        val d = docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        if (i == 0) d
        else d.withColumn("text",
          expr(s"concat_ws(' ', transform(split(text, ' '), t -> concat('c$i', t)))"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until f).map { i =>
        val e = embs.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        if (i == 0) e
        else e.withColumn("embedding",
          expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
            s"slice(embedding, 1, $i))"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // events for the CDC-tier deep queries (k12 partition overwrite):
      // id/user offsets keep copies disjoint, the raw ts column is
      // copied untouched so Tables.events' type normalization still
      // sees the original physical type
      val evs = spark.read.parquet(s"$base/events.parquet")
      (0 until f).map { i =>
        evs.withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f -> dir
    }.toMap

    // interleaved min-of-N, same discipline as Bench: the full battery
    // config at ×1/×8
    val times = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    for (_ <- 1 to repeat; name <- Queries; f <- Factors) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dirs(f)).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val k = (name, f)
      if (!times.contains(k) || sec < times(k)) times(k) = sec
    }

    // census-tuned widths per factor (tuning cost billed separately)
    val tuned: Map[Int, (Int, Long, Long, Double)] =
      (Factors :+ DeepFactor :+ X64Factor).map { f =>
      val t0 = System.nanoTime()
      val c = graft.operators.LshTuner.chooseBandBits(
        neardupCorpus(spark, dirs(f)), "embedding", bands = 2)
      f -> ((c.bits, c.candPairs, c.maxBucket, (System.nanoTime() - t0) / 1e9))
    }.toMap

    // census-tuned IVF width per factor (VERDICT r15 #4): chooseNlist
    // holds the probed volume ≤ 2048 rows/query as the corpus grows,
    // then the corpus is WRITTEN bucketed at that width — tuning and
    // write cost are billed separately (they are corpus-build costs, the
    // same ledger as the LSH census), and the timed deep query is the
    // partition-pruned probed read.
    val ivfTuned: Map[Int, (graft.operators.IvfTuner.Census, Seq[Int], String, Double, Double)] =
      (Factors :+ DeepFactor).map { f =>
        val emb = spark.read.parquet(s"${dirs(f)}/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val t0 = System.nanoTime()
        val c = graft.operators.IvfTuner.chooseNlist(emb, "embedding",
          nprobe = 4, maxProbedRows = 2048)
        val tuneSec = (System.nanoTime() - t0) / 1e9
        val probes = graft.operators.IvfTuner.probeList(c.nlist, 4)
        val path = s"${dirs(f)}/emb_ivf_tuned"
        val t1 = System.nanoTime()
        graft.operators.Layout.writeIvfBucketed(emb, path, c.nlist)
        val writeSec = (System.nanoTime() - t1) / 1e9
        f -> ((c, probes, path, tuneSec, writeSec))
      }.toMap

    def deepRunner(name: String, f: Int): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      name match {
        case "sim_ivf_topk" =>
          (s, _) => { val (_, probes, path, _, _) = ivfTuned(f)
            graft.operators.Layout.ivfProbedTopk(s, path, probes, 20) }
        case "sim_ivfpq_topk" =>
          (s, _) => { val (_, probes, path, _, _) = ivfTuned(f)
            graft.queries.VectorQueries.ivfProbedPqTopk(s, path, probes, 10) }
        case "dedup_semantic_keep" =>
          (s, d) => graft.queries.EmbedNeardupQueries.semanticKeep(s, d, 2, tuned(f)._1)
        case "sim_embed_neardup" =>
          (s, d) => graft.queries.EmbedNeardupQueries.embedNeardup(s, d, 2, tuned(f)._1)
        case "sim_hnsw_topk" =>
          (s, d) => graft.queries.GraphAnnQueries.hnswTopk(s, d, tuned(f)._1)
        case "sim_hnsw_maintain" =>
          (s, d) => graft.queries.GraphAnnQueries.hnswMaintain(s, d, tuned(f)._1)
        case "sim_index_maintain" =>
          (s, d) => graft.queries.VectorIndexQueries.maintainAt(s, d, ivfTuned(f)._1.nlist)
        case "sim_index_retrain" =>
          (s, d) => graft.queries.VectorIndexQueries.retrainAt(s, d, ivfTuned(f)._1.nlist)
        case "sim_hnsw_batch" =>
          (s, d) => graft.queries.GraphAnnQueries.hnswBatch(s, d, tuned(f)._1)
        case "sim_hnsw_hier" =>
          (s, d) => graft.queries.GraphAnnQueries.hnswHier(s, d, tuned(f)._1)
        case other => SparkEntry.queries(other)
      }

    // deep tier: census-width runners at ×1/×8/×32 (for the non-LSH deep
    // queries the runner IS the battery query)
    val deepTimes = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    for (_ <- 1 to repeat; name <- DeepQueries; f <- Factors :+ DeepFactor) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      deepRunner(name, f)(spark, dirs(f)).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val k = (name, f)
      if (!deepTimes.contains(k) || sec < deepTimes(k)) deepTimes(k) = sec
    }
    // VERDICT r17 #3 — adjudicate sim_hnsw_maintain's ×32/×8: its ×32
    // absolute is ~3 s, where per-JOB fixed cost (≈40 Spark jobs per
    // cycle: checkpoints, broadcasts, the audit joins) is a large
    // additive term with ±70% run-to-run swing. Two instruments: (a)
    // ≥5-run min-of-run per factor (the battery's variance protocol);
    // (b) an EMPTY-BATCH probe with the identical plan structure — its
    // time IS the fixed cost, so (t - overhead) isolates the data term
    // and the data-term ratio is the honest slope.
    val MaintainReps = 5
    for (_ <- 1 to math.max(0, MaintainReps - repeat); f <- Factors :+ DeepFactor) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      deepRunner("sim_hnsw_maintain", f)(spark, dirs(f))
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val k = ("sim_hnsw_maintain", f)
      if (sec < deepTimes(k)) deepTimes(k) = sec
    }
    val maintainOverhead: Map[Int, Double] = (Factors :+ DeepFactor).map { f =>
      var best = Double.MaxValue
      for (_ <- 1 to MaintainReps) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.queries.GraphAnnQueries.hnswMaintainOverhead(spark, dirs(f), tuned(f)._1)
          .write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      f -> best
    }.toMap
    // ×64 adjudication points for the skew-capped families (VERDICT r18
    // #8): min-of-2, at the ×64 census width for the embed pipeline.
    // CLEAN SLATE first: by this point the deep tier's session-memoized
    // artifacts hold checkpoint blocks that squeeze the probe's own
    // materialization into eviction/spill — the contaminated ×64 winnow
    // read measured 35.6 s where a fresh-JVM run takes ~15 s. A
    // production job does not carry another job's cache; neither does
    // this adjudication.
    graft.queries.PipelineShared.clearMemo()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // the WINNOW and CONTAINMENT families adjudicate through the
    // ISOLATED-JVM channel at BOTH factors: a harness that has run
    // ~250 queries carries session state (old-gen pressure, listener
    // backlog) that measured 27-36 s for the ×64 winnow read where a
    // fresh JVM reads ~15 s — the engine's slope is the clean number,
    // and comparing ×32 vs ×64 through the SAME channel is what makes
    // the ratio meaningful. r20: the probes run AFTER spark.stop() —
    // the r20 in-flight probes read 22-37 s where the same probe on a
    // quiet machine reads 5-9 s, because the parent's live 48 GB
    // session (executor threads parked, heap resident, OS page cache
    // squeezed) contends with the subprocess; deferring them to the
    // spark-free tail of the run removes that contention from the
    // measurement. The embed pipeline needs the in-harness census
    // width, and its in-harness ×64 is already clean (≈1.4×).
    val embedX64: Double = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.queries.EmbedNeardupQueries.embedNeardup(
            spark, dirs(X64Factor), 2, tuned(X64Factor)._1)
          .write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    // MANIFEST READ-PLANNING probe (VERDICT r18 #1): a table whose FILE
    // COUNT grows ×32 while the read stays selective — range-clustered
    // files + declared id stats, so the pushed point filter prunes to
    // ~1 file and the WARM read prices planning (manifest filtering +
    // stats keep-test), not scan volume. With manifest planning (zero
    // directory listing, per-version memoized ledger) the warm read
    // must stay ~flat as files grow ×32; the FIRST read of each version
    // pays the one-time ledger parse (reported separately — the honest
    // O(files) term, paid once per process per version, not per read).
    // r20 (VERDICT r19 #1): the probe now reaches ~10⁵ REAL files
    // (×1536 = 98,304) — the 100 TB regime's file-count order — and
    // reports the ledger's on-disk bytes (the quantity the driver-
    // resident parse holds, modulo object overhead). The warm read
    // additionally benefits from the r20 per-snapshot partition-
    // grouping memo: grouping parses once per snapshot per process,
    // PruneContext keep-tests remain the per-read O(files) term.
    val manifestPlanning: Map[Int, (Long, Double, Double, Long)] =
      Seq(1, 8, 32, 256, 1536).map { f =>
      val nFiles = f * 64
      val path = new java.io.File(
        s"target/graft-state/scale_manifest_x$f").getAbsolutePath
      graft.operators.TableMerge.drop(path, ifExists = true)
      graft.operators.TableMerge.createOrReplace(
        spark.range(nFiles.toLong * 64)
          .selectExpr("id", "id % 8 AS g", "id * 3 AS v")
          .repartitionByRange(nFiles, col("id")), path)
      graft.operators.TableMerge.analyzeStats(spark, path, Seq("id"))
      val live = new java.io.File(path,
        graft.operators.TableMerge.liveVersion(path).get)
      val ledgerBytes = Seq("_graft_manifest.tsv", "_graft_stats.tsv")
        .map(n => new java.io.File(live, n))
        .filter(_.exists).map(_.length).sum
      var first = 0.0
      var best = Double.MaxValue
      for (i <- 0 until 6) {
        val t0 = System.nanoTime()
        val n = graft.operators.TableMerge.read(spark, path)
          .filter(col("id") === 7L).count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(n == 1L, s"manifest probe wrong answer: $n")
        if (i == 0) first = sec else best = math.min(best, sec)
      }
      f -> ((nFiles.toLong, first, best, ledgerBytes))
    }.toMap

    // fixed-8-bit ×32 documentation points, single run — the point is the
    // order of magnitude (15-35× over linear), not a tight timing
    val fixed32 = FixedWidthDoc.map { name =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dirs(DeepFactor)).write.mode("overwrite").format("noop").save()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap

    // band-bucket diagnostics: replicate dedup_minhash_pairs' candidate
    // generation (same 3-shingle minhash, r=2/b=2 bands) and report the
    // pair volume the band join would produce BEFORE the distinct —
    // the quantity that must stay ~linear for the design to hold.
    val bandStats: Map[Int, (Long, Long, Long)] = Factors.map { f =>
      val spec = Seq((1000003L, 12345L), (999983L, 54321L), (999979L, 11111L),
        (1000033L, 77777L)).map { case (a, b) => s"$a,$b" }.mkString(";")
      val P = 2147483647L
      val docs = spark.read.parquet(s"${dirs(f)}/documents.parquet")
        .selectExpr("doc_id", "split(text, ' ') AS tokens")
      val dups = docs.filter(col("doc_id") % 20 === 0)
        .selectExpr("doc_id + 100000 AS doc_id", "slice(tokens, 2, size(tokens) - 1) AS tokens")
      val buckets = docs.union(dups).filter(size(col("tokens")) >= 3)
        .selectExpr("doc_id", s"graft_minhash(graft_shingle_set(graft_word_fps(tokens)), '$spec') AS sig")
        .selectExpr("doc_id",
          s"(sig[0] * 31 + sig[1]) % $P AS band_0", s"(sig[2] * 31 + sig[3]) % $P AS band_1")
        .selectExpr("doc_id", "posexplode(array(band_0, band_1)) AS (band_idx, band_val)")
        .groupBy("band_idx", "band_val").agg(count(lit(1)).as("n"))
      val row = buckets.agg(
        sum(expr("n * (n - 1) DIV 2")).as("cand_pairs"),
        max("n").as("max_bucket"),
        count(lit(1)).as("n_buckets")).head()
      f -> (row.getLong(0), row.getLong(1), row.getLong(2))
    }.toMap

    // winnow df-cap census (VERDICT r12 #3): at ×f the query's boilerplate
    // footer is shared across ALL copies (the fixture appends it AFTER the
    // per-copy token prefixing), so hot-print df grows ×f and UNCAPPED
    // candidate volume grows quadratically — the capped volume must stay
    // ~linear for the cap to be the claimed skew guard. Reported: the
    // candidate-pair sums Σ df·(df−1)/2 with and without the df ≤ 32 cap,
    // and the hottest print's df.
    val winnowStats: Map[Int, (Long, Long, Long)] = Seq(8, DeepFactor, X64Factor).map { f =>
      val boiler = "all rights reserved contact the site administrator for removal details"
      val base = spark.read.parquet(s"${dirs(f)}/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + boiler)))
            .otherwise(col("text")).as("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 20 === 0).select(
          (col("doc_id") + 100000).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))")
            .as("text")))
      val fps = corpus.withColumn("tokens", split(col("text"), " "))
        .filter(size(col("tokens")) >= 6)
        .withColumn("hashes", expr(graft.queries.PipelineShared.winnowHashesExpr(3)))
        .withColumn("sels", expr(graft.queries.PipelineShared.winnowSelsExpr(4)))
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sels, p -> element_at(hashes, p)))")).as("h"))
      val row = fps.groupBy("h").agg(count(lit(1)).as("df"))
        .agg(sum(expr("df * (df - 1) DIV 2")).as("cand_uncapped"),
          sum(expr("CASE WHEN df <= 32 THEN df * (df - 1) DIV 2 ELSE 0 END"))
            .as("cand_capped"),
          max("df").as("max_df")).head()
      f -> ((row.getLong(0), row.getLong(1), row.getLong(2)))
    }.toMap

    // containment df-cap census (VERDICT r16 #8): the containment join's
    // candidate volume is Σ df(df−1)/2 over the shingle inverted index —
    // the same skew law as the winnow join. At ×f every copy contributes
    // its own disjoint shingle vocabulary (prefixed tokens), so TRUE df
    // grows only on organically-hot shingles; the census prices what the
    // ContainDfCap=32 guard drops and shows the capped volume staying
    // ~linear while the uncapped bound compounds. Reported at the same
    // factors as winnow_cap, with the capped volume at 16/32/64 so the
    // battery's cap choice is a measured pick, not a constant of faith.
    val containStats: Map[Int, (Long, Long, Long, Long, Long)] =
      Seq(8, DeepFactor, X64Factor).map { f =>
      val base = spark.read.parquet(s"${dirs(f)}/documents.parquet")
        .selectExpr("doc_id", "split(text, ' ') AS tokens")
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 12 === 0 && size(col("tokens")) >= 12)
          .select((col("doc_id") + 500000).as("doc_id"),
            expr("slice(tokens, 3, 10)").as("tokens")))
        .filter(size(col("tokens")) >= 3)
      val row = corpus
        .selectExpr("doc_id", "explode(graft_shingle_set(graft_word_fps(tokens))) AS sh")
        .groupBy("sh").agg(count(lit(1)).as("df"))
        .agg(sum(expr("df * (df - 1) DIV 2")).as("cand_uncapped"),
          sum(expr("CASE WHEN df <= 16 THEN df * (df - 1) DIV 2 ELSE 0 END")).as("cand_cap16"),
          sum(expr("CASE WHEN df <= 32 THEN df * (df - 1) DIV 2 ELSE 0 END")).as("cand_cap32"),
          sum(expr("CASE WHEN df <= 64 THEN df * (df - 1) DIV 2 ELSE 0 END")).as("cand_cap64"),
          max("df").as("max_df")).head()
      f -> ((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)))
    }.toMap

    // ---- spark-free tail: every in-harness measurement is done; stop
    // the session so the isolated-JVM probes run against a quiet
    // machine (see the channel note above), then assemble the JSON.
    spark.stop()
    System.gc()
    def isolatedSec(dir: String, name: String, reps: Int): Double = {
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val pb = new ProcessBuilder(javaBin, "-Xmx32g", "-cp",
        System.getProperty("java.class.path"),
        "graft.ScaleProbe", dir, name, reps.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      """"sec":([0-9.]+)""".r.findFirstMatchIn(out)
        .map(_.group(1).toDouble)
        .getOrElse(throw new IllegalStateException(
          s"ScaleProbe($name) produced no timing line:\n${out.takeRight(800)}"))
    }
    val winnowIso32 = isolatedSec(dirs(DeepFactor), "dedup_winnow_capped", 2)
    val containIso32 = isolatedSec(dirs(DeepFactor), "dedup_containment_incr", 2)
    val x64Times: Map[String, Double] = Map(
      "dedup_winnow_capped" -> isolatedSec(dirs(X64Factor), "dedup_winnow_capped", 2),
      "sim_embed_neardup" -> embedX64,
      "dedup_containment_incr" ->
        isolatedSec(dirs(X64Factor), "dedup_containment_incr", 2))

    def r3(v: Double): String = f"$v%.3f"
    val perQuery = Queries.map { q =>
      val t1 = times((q, 1)); val t8 = times((q, 8))
      s""""$q":{"x1":${r3(t1)},"x8":${r3(t8)},"ratio":${r3(t8 / math.max(t1, 1e-9))}}"""
    }.mkString("{", ",", "}")
    val deepJson = DeepQueries.map { q =>
      val t1 = deepTimes((q, 1)); val t8 = deepTimes((q, 8)); val t32 = deepTimes((q, DeepFactor))
      // t×32/t×8 against 4× more data — ≲4 means the curve stays linear
      val bits = if (FixedWidthDoc.contains(q)) {
        val bitsJson = (Factors :+ DeepFactor)
          .map(f => s""""x$f":${tuned(f)._1}""").mkString("{", ",", "}")
        s""","band_bits":$bitsJson,"x32_fixed8":${r3(fixed32(q))}"""
      } else ""
      s""""$q":{"x1":${r3(t1)},"x8":${r3(t8)},"x$DeepFactor":${r3(t32)},""" +
        s""""ratio_x32_x8":${r3(t32 / math.max(t8, 1e-9))}$bits}"""
    }.mkString("{", ",", "}")
    // the census itself (the production tuning cost) + what it measured
    val lshJson = (Factors :+ DeepFactor).map { f =>
      val (bits, pairs, maxB, sec) = tuned(f)
      s""""x$f":{"bits":$bits,"cand_pairs":$pairs,"max_bucket":$maxB,"tune_sec":${r3(sec)}}"""
    }.mkString("{", ",", "}")
    val bands = Factors.map { f =>
      val (pairs, maxB, nB) = bandStats(f)
      s""""x$f":{"cand_pairs":$pairs,"max_bucket":$maxB,"n_buckets":$nB}"""
    }.mkString("{", ",", "}")
    val t1Total = Queries.map(q => times((q, 1))).sum
    val t8Total = Queries.map(q => times((q, 8))).sum
    val winnowJson = Seq(8, DeepFactor, X64Factor).map { f =>
      val (unc, cap, maxDf) = winnowStats(f)
      s""""x$f":{"cand_uncapped":$unc,"cand_capped":$cap,"max_df":$maxDf}"""
    }.mkString("{", ",", "}")
    // the ×64 doubling verdict for the two skew-capped families:
    // ratio_x64_x32 against 2× more data — ≲2 = still linear per row
    val x64Json = X64Queries.map { q =>
      // both factors through the SAME channel: isolated JVM for winnow,
      // in-harness (census-width) for embed
      val (t32, t64, channel) = q match {
        case "dedup_winnow_capped" =>
          (winnowIso32, x64Times(q), "isolated-jvm")
        case "dedup_containment_incr" =>
          (containIso32, x64Times(q), "isolated-jvm")
        case _ =>
          (deepTimes((q, DeepFactor)), x64Times(q), "in-harness")
      }
      val bits =
        if (q == "sim_embed_neardup") s""","band_bits_x64":${tuned(X64Factor)._1}"""
        else ""
      s""""$q":{"x32":${r3(t32)},"x64":${r3(t64)},""" +
        s""""ratio_x64_x32":${r3(t64 / math.max(t32, 1e-9))},""" +
        s""""channel":"$channel"$bits}"""
    }.mkString("{", ",", "}")
    val manifestJson = Seq(1, 8, 32, 256, 1536).map { f =>
      val (nFiles, first, best, ledgerBytes) = manifestPlanning(f)
      s""""x$f":{"n_files":$nFiles,"first_read_sec":${r3(first)},""" +
        s""""warm_read_sec":${r3(best)},"ledger_bytes":$ledgerBytes}"""
    }.mkString("{", ",", "}")
    val containJson = Seq(8, DeepFactor, X64Factor).map { f =>
      val (unc, c16, c32, c64, maxDf) = containStats(f)
      s""""x$f":{"cand_uncapped":$unc,"cand_cap16":$c16,"cand_cap32":$c32,""" +
        s""""cand_cap64":$c64,"max_df":$maxDf}"""
    }.mkString("{", ",", "}")
    // the IVF width census (the production tuning cost) + what it chose
    val ivfJson = (Factors :+ DeepFactor).map { f =>
      val (c, _, _, tuneSec, writeSec) = ivfTuned(f)
      s""""x$f":{"nlist":${c.nlist},"n_rows":${c.nRows},"probed_rows":${c.probedRows},""" +
        s""""max_list":${c.maxList},"tune_sec":${r3(tuneSec)},"write_sec":${r3(writeSec)}}"""
    }.mkString("{", ",", "}")
    // the sim_hnsw_maintain adjudication block: min-of-5 totals, the
    // empty-batch fixed-cost probe, and the overhead-adjusted data-term
    // ratio (the number the ≤~1.5 target should be read against)
    val maintainJson = {
      val t8 = deepTimes(("sim_hnsw_maintain", 8))
      val t32 = deepTimes(("sim_hnsw_maintain", DeepFactor))
      val o8 = maintainOverhead(8)
      val o32 = maintainOverhead(DeepFactor)
      val d8 = math.max(t8 - o8, 1e-3)
      val d32 = math.max(t32 - o32, 1e-3)
      val oJson = (Factors :+ DeepFactor)
        .map(f => s""""x$f":${r3(maintainOverhead(f))}""").mkString("{", ",", "}")
      s"""{"reps":$MaintainReps,"overhead":$oJson,""" +
        s""""data_x8":${r3(d8)},"data_x$DeepFactor":${r3(d32)},""" +
        s""""data_ratio_x32_x8":${r3(d32 / d8)}}"""
    }
    val line = s"""{"metric":"scale_slope","base":"$base","factors":[1,8,$DeepFactor],""" +
      s""""total_x1":${r3(t1Total)},"total_x8":${r3(t8Total)},""" +
      s""""total_ratio":${r3(t8Total / t1Total)},"queries":$perQuery,""" +
      s""""deep":$deepJson,"lsh_census":$lshJson,"ivf_census":$ivfJson,""" +
      s""""minhash_bands":$bands,"winnow_cap":$winnowJson,""" +
      s""""hnsw_maintain_adjudication":$maintainJson,""" +
      s""""x64_adjudication":$x64Json,""" +
      s""""manifest_planning":$manifestJson,""" +
      s""""containment_cap":$containJson}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_scale.json"),
      (line + "\n").getBytes("UTF-8"))
  }
}
