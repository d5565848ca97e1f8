package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the properties that decide 100 TB behavior are
  * asserted, not eyeballed — column pruning reaches the parquet scan,
  * dim joins stay broadcast (fact side never shuffles for them),
  * aggregations split partial/final (map-side combine), the latest-wins
  * window shuffles once on its key, and no query plans a cartesian
  * product. Audited on the pre-AQE strategy plan (AQE only narrows
  * these choices at runtime, never widens).
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf)

  test("p1_project_prune: scan reads only the 4 projected columns") {
    val scans = collect(plan("p1_project_prune")) { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val cols = scans.head.output.map(_.name).toSet
    assert(cols == Set("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      s"scan reads $cols — pruning failed")
  }

  test("j13_broadcast_join: the dim side is broadcast, fact side never shuffles") {
    val p = plan("j13_broadcast_join")
    assert(collect(p) { case j: BroadcastHashJoinExec => j }.nonEmpty)
    // the only shuffles are for the aggregation/order, not the join:
    // lineitem flows scan→join with no exchange below the join
    val joins = collect(p) { case j: BroadcastHashJoinExec => j }
    val streamedSide = joins.head.children.head
    assert(collect(streamedSide) { case e: ShuffleExchangeExec => e }.isEmpty,
      "fact side shuffled before the broadcast join")
  }

  test("j14_star_join: both small dims broadcast") {
    val joins = collect(plan("j14_star_join")) { case j: BroadcastHashJoinExec => j }
    assert(joins.size >= 2, s"expected ≥2 broadcast joins, got ${joins.size}")
  }

  test("j10_expr_join: derived dim broadcast (no SMJ on the fact side)") {
    assert(collect(plan("j10_expr_join")) { case j: BroadcastHashJoinExec => j }.nonEmpty)
  }

  test("a1/a2: aggregations split partial/final for map-side combine") {
    for (q <- Seq("a1_countdistinct_max", "a2_perkey_distinct")) {
      val aggs = collect(plan(q)) { case a: HashAggregateExec => a }
      assert(aggs.size >= 2, s"$q: expected partial+final HashAggregate, got ${aggs.size}")
    }
  }

  test("w1_latest_wins: exactly one hash shuffle (window key), one range (output order)") {
    // exchanges appear at EnsureRequirements; look at the executed plan
    // with AQE off (the AdaptiveSparkPlanExec wrapper is opaque to collect)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      collect(SparkEntry.queries("w1_latest_wins")(spark, sf)
        .queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(exchanges.size == 2, s"got ${exchanges.map(_.outputPartitioning)}")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds == Seq("HashPartitioning", "RangePartitioning"), kinds.toString)
  }

  test("sessionize_batch: both windows and the session agg share ONE user_id exchange") {
    // lag-window, cumsum-window, and groupBy(user_id, sess_seq) are all
    // satisfied by hash(user_id) — EnsureRequirements must insert just
    // that one, plus the range exchange for the output order
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      collect(SparkEntry.queries("sessionize_batch")(spark, sf)
        .queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds == Seq("HashPartitioning", "RangePartitioning"), kinds.toString)
  }

  test("pack_sequences: one source exchange feeds the running-total window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      collect(SparkEntry.queries("pack_sequences")(spark, sf)
        .queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds == Seq("HashPartitioning", "RangePartitioning"), kinds.toString)
  }

  test("dedup_span_coverage: TWO hash shuffles (shingle reused, doc) + output range") {
    // the multi-doc flag agg and the semi join's probe side cluster on
    // the SAME 8-byte shingle shuffle of the same subtree — exchange
    // reuse collapses them to one; the per-doc window's hash(doc_id)
    // also satisfies the (doc_id, n_tokens) grouping (subset rule) so
    // the interval merge costs no extra exchange; the only other
    // shuffle is the output sort. A third hash exchange would mean
    // either the reuse broke (sh scanned twice through different
    // shuffles) or the merge stopped sharing the window's partitioning.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      collect(SparkEntry.queries("dedup_span_coverage")(spark, sf)
        .queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds == Seq("HashPartitioning", "HashPartitioning", "RangePartitioning"),
      kinds.toString)
  }

  test("e2e_curation_funnel: reuse holds the funnel to 2 digest passes + tiny aggs") {
    // the rates derivation embeds the flagged subtree twice (global srt
    // total + per-source rates) on top of the main branch — THREE
    // lineage copies of the digest window, which exchange reuse must
    // collapse to two physical hash(digest) shuffles. The rest are
    // metadata-sized: two hash(source) aggregate exchanges, the 4-row
    // SinglePartition total, and the output range sort. A third
    // hash(digest) appearing means reuse broke and the corpus would be
    // shuffled three times at scale.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      collect(SparkEntry.queries("e2e_curation_funnel")(spark, sf)
        .queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val parts = exchanges.map(_.outputPartitioning.toString)
    val nDigest = parts.count(_.contains("digest"))
    val nSourceHash = parts.count(_.startsWith("hashpartitioning(source"))
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(nDigest == 2, s"digest shuffles: $parts")
    // rates ×2 lineage embeddings + the final report agg
    assert(nSourceHash == 3, s"source shuffles: $parts")
    assert(kinds.count(_ == "SinglePartition$") == 1, kinds.toString)
    assert(exchanges.size == 7, parts.toString)
  }

  test("agg_topk_freq: the custom aggregate splits partial/final for map-side combine") {
    val aggs = collect(plan("agg_topk_freq")) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      case a: HashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final aggregate, got ${aggs.size}")
  }

  test("no relational query plans a cartesian product") {
    // the full registry minus entries that run driver-side actions or
    // sink writes during construction, plus the ONE deliberate
    // all-pairs query: dedup_lsh_recall's ground truth IS the brute
    // force the LSH path exists to avoid (sampled at scale)
    val skip = Set("a6_cardinality", "a8_observe_metrics", "s1_multiline_json",
      "s9_json_reference", "k1_merge_upsert", "k2_merge_delete", "k3_partitioned_merge",
      "k4_full_refresh", "k6_search_index", "k7_jsonl_export", "sim_semantic_match",
      "j15_bucketed_join", // writes its bucketed tables at plan construction
      "dedup_lsh_recall", "dedup_simhash_recall")
    for ((name, fn) <- SparkEntry.all if !skip(name)) {
      val p = fn(spark, sf).queryExecution.sparkPlan
      val cartesian = collect(p) { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"$name plans a cartesian product")
    }
  }

  test("no query plans a single-partition global window") {
    // Window with an empty partition spec moves ALL rows to one task —
    // the w4 re-plan removed the last one; keep the whole registry clean
    val skip = Set("a6_cardinality", "a8_observe_metrics", "s1_multiline_json",
      "s9_json_reference", "k1_merge_upsert", "k2_merge_delete", "k3_partitioned_merge",
      "k4_full_refresh", "k6_search_index", "k7_jsonl_export", "sim_semantic_match",
      "j15_bucketed_join")
    for ((name, fn) <- SparkEntry.all if !skip(name)) {
      val global = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty, s"$name plans a global single-partition window")
    }
  }

  test("e2e_curation_funnel_v2: rate dim broadcasts, near-dup candidate join is an equi-join") {
    val p = plan("e2e_curation_funnel_v2")
    assert(collect(p) { case c: CartesianProductExec => c }.isEmpty,
      "funnel v2 plans a cartesian")
    // exactly ONE nested loop: the 1-row srt-total broadcast cross join
    // (the sanctioned stats pattern); the band candidate join itself
    // must stay an equi-join
    val bnl = collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.size == 1,
      s"expected only the 1-row total cross join to nest, got ${bnl.size}")
    // the per-source rate dim rides a broadcast join, not a shuffle
    assert(collect(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "rate_bp dim did not broadcast")
  }

  test("search_rag_mmr: only the bounded shortlist self-join nests; corpus side never does") {
    val p = plan("search_rag_mmr")
    assert(collect(p) { case c: CartesianProductExec => c }.isEmpty)
    // five bounded nested loops, none corpus×corpus: the 1-row
    // BM25-stats broadcast under each of the two shortlist subtrees,
    // the <= 20-row shortlist pairwise-sim inequality join, and the two
    // 1-row collected rel/sims frames meeting for the MMR fold. Every
    // build side is a broadcast (no CartesianProduct anywhere), and
    // nothing corpus-sized sits on BOTH sides of any of them.
    val bnl = collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.size <= 5, s"unexpected extra nested loops: ${bnl.size}")
  }

  test("dedup_ngram_jaccard: shingle self-join is an equi-join, no nested loop") {
    val p = plan("dedup_ngram_jaccard")
    // equi-join on the hashed shingle — SMJ or shuffled-hash acceptable
    // pre-AQE; what must NOT appear is a nested-loop over the corpus.
    // The size-attach joins carry no broadcast hint (sizes is
    // per-document, not dim-sized — AQE decides from runtime size).
    assert(collect(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("j16_asof_join: one hash shuffle feeds the as-of window — no range join blowup") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("j16_asof_join")(spark, sf).queryExecution.executedPlan
      assert(collect(p) { case c: CartesianProductExec => c }.isEmpty)
      assert(collect(p) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.isEmpty, "as-of planned as a nested-loop range join")
      val windows = collect(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.size == 1, s"expected one as-of window, got ${windows.size}")
      // exchanges: hash(user_id) for the window, hash(day) for the agg,
      // range for the output order — nothing proportional to pair count
      val kinds = collect(p) { case e: ShuffleExchangeExec =>
        e.outputPartitioning.getClass.getSimpleName }
      assert(kinds.count(_ == "HashPartitioning") == 2 &&
        kinds.count(_ == "RangePartitioning") == 1, kinds.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("j17_range_join: bin join is an equi-join, never a nested loop") {
    val p = plan("j17_range_join")
    assert(collect(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "range join planned as nested loop — bin equi-key lost")
  }

  test("a10_pivot: single aggregate pass, no collect-distinct pre-pass") {
    val p = plan("a10_pivot")
    val scans = collect(p) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"pivot scanned ${scans.size}× — value-list pre-pass leaked in")
    // pivot plans two partial/final pairs (cell aggregate, then the
    // row→column pivot aggregate) — the point is ONE scan, no
    // distinct-values pre-pass, and both pairs split for map-side combine
    val aggs = collect(p) { case a: HashAggregateExec => a }
    assert(aggs.size == 4, s"expected 2 partial+final aggregate pairs, got ${aggs.size}")
  }

  test("split_stratified: scan reads only the key columns") {
    val scans = collect(plan("split_stratified")) { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val cols = scans.head.output.map(_.name).toSet
    assert(cols == Set("doc_id", "source"), s"scan reads $cols — pruning failed")
  }

  test("search_bm25: corpus stats attach via broadcast, not shuffle") {
    val p = plan("search_bm25")
    // the 1-row stats side must be broadcast (BroadcastNestedLoopJoin or
    // BHJ depending on the condition shape); scans of documents: 2
    // passes (stats + score) is the designed shape
    val scans = collect(p) { case s: FileSourceScanExec => s }
    assert(scans.size == 2)
    assert(p.toString.contains("Broadcast"), "stats join is not broadcast")
  }

  test("j15_bucketed_join: co-located sort-merge join, no exchange on either side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // tiny sf0.001 sides would broadcast and bypass the bucket layout —
    // force the join strategy large tables would get
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("j15_bucketed_join")(spark, sf)
        .queryExecution.executedPlan
      val joins = p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, "expected a sort-merge join over the bucketed tables")
      joins.foreach { j =>
        assert(j.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "bucketed join side shuffled — bucket layout not used")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("search_bm25_fields: multi-field stats attach via broadcast, same 2-scan shape") {
    val p = plan("search_bm25_fields")
    val scans = collect(p) { case s: FileSourceScanExec => s }
    assert(scans.size == 2)
    assert(p.toString.contains("Broadcast"), "stats join is not broadcast")
  }

  test("native graft_lsh_bands keeps the signature projection inside codegen") {
    // AQE's wrapper hides the codegen stages from collect — audit with it off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val wsc = try {
      SparkEntry.queries("sim_lsh_buckets")(spark, sf)
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(wsc.exists(w => w.collect { case p: ProjectExec => p }
      .exists(_.projectList.exists(_.toString.contains("graft_lsh_bands")))))
  }

  test("native graft_cosine keeps the embedding scan inside codegen") {
    val df = SparkEntry.queries("sim_cosine_native")(spark, sf)
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(w => w.collect { case p: ProjectExec => p }.nonEmpty))
  }

  test("text_decontam_bloom: the probe filter sits BELOW every shuffle") {
    // the whole point of the semi-join reduction: only Bloom survivors
    // may reach an exchange. A bloom_contains Filter above any shuffle
    // means the corpus shuffled unpruned.
    // exchanges only exist post-EnsureRequirements — audit the executed
    // plan with AQE off, same discipline as the funnel's exchange budget
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      SparkEntry.queries("text_decontam_bloom")(spark, sf).queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the 1-row sketch cross join folds the filter into the broadcast
    // nested-loop join's CONDITION — rows that fail the probe never
    // leave the join, which is the same pre-shuffle prune
    def subtreeHasBloomFilter(n: SparkPlan): Boolean =
      n.collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("graft_bloom_contains") => f
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if j.condition.exists(_.toString.contains("graft_bloom_contains")) => j
      }.nonEmpty
    assert(subtreeHasBloomFilter(p), s"no bloom prefilter in the plan at all:\n$p")
    // every exchange whose subtree scans the CORPUS must already
    // contain the bloom prune below it. The probe branch legitimately
    // shuffles unpruned — its scans carry the pushed In(doc_id, …)
    // probe-id filter, the corpus scan does not.
    def isProbeScan(s: FileSourceScanExec): Boolean =
      s.dataFilters.exists(_.toString.contains("IN (5,42,200)"))
    val corpusShuffles = collect(p) { case e: ShuffleExchangeExec => e }
      .filter(e => e.collect { case s: FileSourceScanExec => s }
        .exists(s => s.output.exists(_.name == "doc_id") && !isProbeScan(s)))
    assert(corpusShuffles.nonEmpty, s"expected the confirm/agg path to shuffle:\n$p")
    corpusShuffles.foreach { e =>
      assert(subtreeHasBloomFilter(e),
        s"corpus shuffled without the bloom prefilter below it:\n$e")
    }
  }

  test("text_winnow_fp: selection is pure projection — only the output sort exchanges") {
    // the winnowing kernel must stay per-row HOF work; any hash
    // exchange would mean the selection was rewritten through a shuffle
    val p = plan("text_winnow_fp")
    val hashEx = collect(p) { case e: ShuffleExchangeExec
      if e.outputPartitioning.toString.contains("hashpartitioning") => e }
    assert(hashEx.isEmpty, s"winnow selection should not hash-shuffle:\n$p")
  }

  test("dedup_winnow_pairs: candidate join is an equi-join on the print, no nested loop") {
    val p = plan("dedup_winnow_pairs")
    val bnl = collect(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec => c
    }
    assert(bnl.isEmpty, s"winnow pair join degenerated to a non-equi join:\n$p")
  }

  test("j19_bloom_semi_join: the fact side never shuffles unpruned") {
    // join-path twin of the decontam assertion: every exchange whose
    // subtree scans lineitem must already carry the bloom prune below
    // it — otherwise the 100 TB fact table paid full shuffle I/O and
    // the reduction bought nothing.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      SparkEntry.queries("j19_bloom_semi_join")(spark, sf).queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    def subtreeHasBloomFilter(n: SparkPlan): Boolean =
      n.collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("graft_bloom_contains") => f
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if j.condition.exists(_.toString.contains("graft_bloom_contains")) => j
      }.nonEmpty
    assert(subtreeHasBloomFilter(p), s"no bloom prefilter in the plan at all:\n$p")
    val factShuffles = collect(p) { case e: ShuffleExchangeExec => e }
      .filter(e => e.collect { case s: FileSourceScanExec => s }
        .exists(_.output.exists(_.name == "l_orderkey")))
    assert(factShuffles.nonEmpty, s"expected the semi join to shuffle the pruned fact:\n$p")
    factShuffles.foreach { e =>
      assert(subtreeHasBloomFilter(e),
        s"fact side shuffled without the bloom prefilter below it:\n$e")
    }
  }

  test("agg_hll_distinct: both sketch aggregations split partial/final") {
    // map-side partial HLL buffers must merge at the reducer — a
    // missing partial means every raw row shuffles to one aggregator
    val p = plan("agg_hll_distinct")
    val objAggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    val partials = objAggs.count(_.aggregateExpressions
      .exists(_.toString.contains("partial_graft_hll")))
    val finals = objAggs.count(a => a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall(e => !e.toString.contains("partial")) &&
      a.aggregateExpressions.exists(_.toString.contains("graft_hll")))
    assert(partials >= 2, s"expected partial hll aggs for build+rollup, got $partials")
    assert(finals >= 2, s"expected final hll aggs for build+rollup, got $finals")
  }

  test("sim_ivfpq_topk: probed-ADC scan never shuffles — one scan, heap top-k") {
    // the composed IVF-PQ read path is a single map-side pipeline:
    // scan → assign → probe filter → ADC → per-partition heap merge.
    // Any ShuffleExchange here would mean the unprobed corpus moved.
    val p = plan("sim_ivfpq_topk")
    assert(collect(p) { case e: ShuffleExchangeExec => e }.isEmpty,
      s"IVF-PQ query shuffled:\n$p")
    assert(collect(p) { case s: FileSourceScanExec => s }.size == 1)
    assert(collect(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected heap top-k, got:\n$p")
    // the optimizer collapses the centroid alias, so the probe filter
    // lands directly on the scan as graft_ivf_assign(...) IN (probes)
    assert(collect(p) {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("graft_ivf_assign") &&
          f.condition.toString.contains(" IN ") => f
    }.nonEmpty, s"probe filter missing below the top-k:\n$p")
  }

  test("sim_ivfpq_rerank: refine fetch is a broadcast point-lookup, no shuffle") {
    // stage 1 (ADC shortlist) and stage 2 (exact re-rank) must both be
    // shuffle-free: the 50-row shortlist broadcasts, the full-vector
    // read joins against it hash-broadcast — at 100 TB that is a
    // point-lookup against the bucketed layout, not a corpus shuffle.
    val p = plan("sim_ivfpq_rerank")
    assert(collect(p) { case e: ShuffleExchangeExec => e }.isEmpty,
      s"rerank path shuffled:\n$p")
    assert(collect(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"shortlist did not attach via broadcast:\n$p")
    assert(collect(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.size == 2, s"expected ADC + refine heap top-ks:\n$p")
  }

  test("text_decontam_semantic: corpus never shuffles below the broadcast probe join") {
    // the asymmetric decontam shape: the eval band index broadcasts,
    // the corpus side is scan → bands → broadcast hash join → cosine
    // confirm, all map-side. Every exchange must sit ABOVE the join —
    // an exchange below it means the corpus moved unpruned.
    // exchanges only exist post-EnsureRequirements — audit the executed
    // plan with AQE off, same discipline as the bloom prefilter test
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      SparkEntry.queries("text_decontam_semantic")(spark, sf).queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"band probe join is not broadcast:\n$p")
    val shuffles = collect(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, "expected the hit dedup/agg exchanges")
    shuffles.foreach { e =>
      assert(e.collectFirst { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"corpus-side shuffle below the probe join:\n$e")
    }
  }

  test("search_hybrid_rrf: rank joins stay broadcast over the 20-row shortlists") {
    // branch top-20s are distributed heap top-ks; ranks come from
    // bounded broadcast self-joins (≤20-row build sides), never a
    // global window. The only exchanges allowed are the 1-row stats
    // agg and the tiny full-outer fusion of two 20-row lists.
    val df = SparkEntry.queries("search_hybrid_rrf")(spark, sf)
    val global = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "RRF fusion planned a global window")
    val p = df.queryExecution.sparkPlan
    val bnlj = collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    // two rank self-joins (left outer, strictly-better condition) plus
    // the 1-row stats crosses — the lex branch's build side is a copy
    // of the probe subtree, so its stats cross appears twice
    val rankJoins = bnlj.filter(b =>
      b.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter &&
        b.condition.nonEmpty)
    assert(rankJoins.size == 2, s"expected 2 rank self-joins, got ${rankJoins.size}:\n$p")
    assert(bnlj.forall(b => b.condition.nonEmpty ||
      b.joinType == org.apache.spark.sql.catalyst.plans.Cross),
      s"unexpected unconditioned non-cross broadcast join:\n$p")
    assert(collect(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.size >= 3, s"expected branch + final heap top-ks:\n$p")
    // corpus-sized subtrees must not feed a shuffle: every exchange in
    // this plan sits above a LIMIT (shortlists) or a 1-row aggregate
    val shuffles = collect(p) { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      val bounded = e.collectFirst {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
        case a: HashAggregateExec if a.groupingExpressions.isEmpty => a
        case l: org.apache.spark.sql.execution.LocalLimitExec => l
      }
      assert(bounded.nonEmpty, s"corpus-sized shuffle in the RRF plan:\n$e")
    }
  }

  test("sim_kmeans_train: k-way distance scan is broadcast-joined, argmin shuffles once on vec_id") {
    // the centroid side is k rows — it must broadcast (BroadcastNestedLoop
    // for the crossJoin), and the only pre-aggregate exchange is the
    // vec_id window's; a SortMergeJoin or centroid-side shuffle would
    // mean the corpus moved to meet 8 rows
    val df = SparkEntry.queries("sim_kmeans_train")(spark, sf)
    val p = df.queryExecution.sparkPlan
    assert(collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, s"no broadcast join in the final assignment plan:\n$p")
    assert(collect(p) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }.isEmpty, "centroid join degenerated to SMJ")
  }

  test("dedup_band_census: every shape's census splits partial/final (map-side combine)") {
    val p = plan("dedup_band_census")
    val aggs = collect(p) { case a: HashAggregateExec => a }
    val partials = aggs.count(_.aggregateExpressions.exists(_.toString.contains("partial_")))
    // 3 shapes x 2 agg layers (bucket count, stat fold) — at least 3 partials
    assert(partials >= 3, s"expected partial aggregates per shape, got $partials:\n$p")
  }

  test("sim_index_maintain: probed read prunes to the nprobe centroid partitions") {
    // the query runs the create+merge side effects, then returns the
    // probed top-k read over the MAINTAINED layout — the isin filter on
    // the partition column must resolve to partition pruning, so the
    // scan touches nprobe of nlist partition dirs before decoding a row
    val df = SparkEntry.queries("sim_index_maintain")(spark, sf)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val idxScan = scans.find(_.partitionFilters.exists(
      _.references.exists(_.name == "centroid_id")))
    assert(idxScan.nonEmpty, s"no partition filter on centroid_id:\n${scans.map(_.metadata)}")
    // 4 probes of 16 lists: the selected partition count must be <= 4
    assert(idxScan.get.selectedPartitions.partitionCount <= 4,
      s"pruning left ${idxScan.get.selectedPartitions.partitionCount} partitions")
  }

  test("sample_dsir: the 64-row weight table attaches via broadcast, no shuffle") {
    val joins = collect(plan("sample_dsir")) { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "weight table did not broadcast")
  }

  test("text_perceptron: the final weight join broadcasts (epoch plans materialize at checkpoint time with the same shape)") {
    // each epoch's weights are localCheckpointed during construction, so
    // the returned plan carries only the FINAL scoring pass — its
    // broadcast shape is the one every materialized epoch shared
    val joins = collect(plan("text_perceptron")) { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "final weight join did not broadcast")
  }

  test("sample_curriculum: bin offsets broadcast; the rank window is bin-partitioned, not global") {
    val p = plan("sample_curriculum")
    assert(collect(p) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "offset fix-up did not broadcast")
    val global = SparkEntry.queries("sample_curriculum")(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
    assert(global.isEmpty, "curriculum rank fell back to a global window")
  }

  test("graph_triangles: all three triangle legs are equi-joins, no nested loop on graph data") {
    val p = plan("graph_triangles")
    assert(collect(p) { case c: CartesianProductExec => c }.isEmpty)
    // the only BNLs are the two sanctioned 1-row scalar attaches
    // (triangle total × edge total, then totals onto the census)
    val bnl = collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.size <= 2, s"unexpected nested-loop joins: ${bnl.size}")
  }

  test("mm_mp4_samples: scan reads only doc_id and text") {
    val scans = collect(plan("mm_mp4_samples")) { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val cols = scans.head.output.map(_.name).toSet
    assert(cols == Set("doc_id", "text"), s"scan reads $cols — pruning failed")
  }
}
