package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TableMerge
import graft.queries.PipelineShared._

/** Distributed-library-function + sketch-aggregation tier (split from
  * ComposedQueries in r14 — registry names and oracles unchanged): the
  * golden-digest-pinned rows-only entries (subject matcher, chunkers,
  * summarizer, semantic matcher), skew-salted aggregation, the
  * event-time window aggregate, heavy hitters through TopKFreq,
  * mergeable HLL / histogram sketch rollups, and batch sessionization.
  * SQL-expressible entries are hash-verified against the DuckDB oracles
  * below; the rest carry fatal pinned digests
  * (PipelineShared.withGoldenDigest).
  */
private[queries] object DistAggQueries {

  /** F14 — SubjectMatcher applied distributed: the TF-IDF+lexical model
    * is fit once on the driver from a dim-sized subject corpus and
    * shipped via `sc.broadcast` (the reference broadcasts the same way,
    * transformer.py:1492-1493) — once per executor, not once per task
    * closure. Matches explode to one row per (doc, subject). Rows-only
    * + golden digest: the matcher's semantics are pinned by
    * SubjectMatcherSpec's labeled cases; no SQL oracle can express the
    * TF-IDF fit. */
  private val subjectMatchTopk: Q = (s, d) => {
    import graft.functions.SubjectMatcher
    import graft.functions.SubjectMatcher.Subject
    val bcMatcher = s.sparkContext.broadcast(new SubjectMatcher(Seq(
      Subject(1, None, Some("table scan query"), Some("SQL101")),
      Subject(2, None, Some("join filter merge"), Some("SQL201")),
      Subject(3, None, Some("stream window batch"), Some("SQL301")),
      Subject(4, None, Some("hash group sort"), Some("SQL401"))),
      threshold = 0.5))
    val matchUdf = udf((title: String) =>
      bcMatcher.value.matchSubjects(Option(title), None).map(m => (m.subjectId, m.similarity)))
    val base = Tables.documents(s, d)
      .withColumn("title", concat_ws(" ", slice(split(col("text"), " "), 1, 12)))
      .select(col("doc_id"), explode(matchUdf(col("title"))).as("m"))
      .select(col("doc_id"), col("m._1").as("subject_id"),
        floor(col("m._2") * 10000).cast("long").as("sim_e4"))
      .orderBy("doc_id", "subject_id")
    withGoldenDigest(base, d, "subject_match_topk")
  }

  /** F19/F20 — the boundary-snapping chunker distributed via typed
    * flatMap (the reference crosses a Python mapPartitions boundary
    * here, transformer.py:2023-2024; we stay in Tungsten rows). One
    * tier-3 chunk row per (doc, order) with sha256 ids and `\w+` token
    * counts. Rows-only check: the chunker's semantics are pinned by
    * ChunkerSpec's golden+property tests. */
  private val chunkParagraph: Q = (s, d) => {
    import s.implicits._
    import graft.chunk.Chunker
    val cfg = Chunker.Config(maxChars = 200, minChars = 40, overlapChars = 40)
    val chunkRows = Tables.documents(s, d)
      .select("doc_id", "lang", "text")
      // chunking is CPU-bound per row; a sub-128MB file arrives as ONE
      // input partition, so byte-based splits under-provision it — fan
      // out to the full core count before the flatMap (same fix applies
      // on a real cluster whenever scan parallelism < CPU-heavy-stage
      // parallelism)
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val (rows, status) =
          Chunker.chunkDocumentRecord(s"res_$id", s"asset_$id", lang, Seq(1 -> text), cfg)
        rows.map(r => (id, r.chunk_order, r.token_count, r.chunk_id, status))
      }
    val base = chunkRows
      .toDF("doc_id", "chunk_order", "token_count", "chunk_id", "status")
      .orderBy("doc_id", "chunk_order")
    withGoldenDigest(base, d, "chunk_paragraph")
  }

  /** F21+F22 — hierarchical 3-tier chunking distributed: each document
    * becomes a 2-page "PDF" with a synthetic outline, chunked into
    * doc-summary/chapter-summary/section-detail tiers with parent links.
    * Rows-only: semantics pinned by HierarchySpec. */
  private val chunkHierarchical: Q = (s, d) => {
    import s.implicits._
    import graft.chunk.{Chunker, HierarchicalChunker, TocExtractor}
    val cfg = HierarchicalChunker.Config(
      sectionChunk = Chunker.Config(maxChars = 240, minChars = 40, overlapChars = 40))
    Tables.documents(s, d)
      .select("doc_id", "lang", "text")
      .repartition(s.sparkContext.defaultParallelism) // CPU-bound stage: see chunkParagraph
      .as[(Long, String, String)]
      .flatMap { case (id, lang0, text0) =>
        // bronze rows may carry null text/lang — degrade, don't NPE
        val text = Option(text0).getOrElse("")
        val lang = Option(lang0).getOrElse("")
        val mid = text.length / 2
        val pages = Seq(1 -> text.take(mid), 2 -> text.drop(mid))
        val outline = Seq(
          TocExtractor.OutlineEntry(0, s"Chapter 1 part a", Some(1)),
          TocExtractor.OutlineEntry(0, s"Chapter 2 part b", Some(2)))
        val (chunks, structure, status) =
          HierarchicalChunker.chunkDocument(s"res_$id", s"asset_$id", lang, pages, outline, cfg)
        chunks.map(c => (id, c.chunk_tier, c.chunk_order, c.chunk_type,
          c.parent_chunk_id.isDefined, structure.map(_.toc_method).getOrElse(""), status))
      }
      .toDF("doc_id", "chunk_tier", "chunk_order", "chunk_type", "has_parent",
        "toc_method", "status")
      .orderBy("doc_id", "chunk_tier", "chunk_order", "chunk_type")
      .transform(withGoldenDigest(_, d, "chunk_hierarchical"))
  }

  /** F23 — extractive summarization distributed via UDF (char-ngram
    * TF-IDF, top sentences in original order). Rows-only: semantics
    * pinned by HierarchySpec. */
  private val textSummarize: Q = (s, d) => {
    import graft.chunk.Summarizer
    val summarizeUdf = udf((text: String) =>
      Summarizer.summarize(Option(text).getOrElse("").replace(". ", ".\n"),
        Summarizer.Config(maxSentences = 2, minSentenceChars = 10)).size)
    Tables.documents(s, d)
      .select(col("doc_id"), summarizeUdf(col("text")).as("n_summary_sentences"))
      .orderBy("doc_id")
      .transform(withGoldenDigest(_, d, "text_summarize"))
  }

  /** F24 — semantic matcher distributed: subject vectors = the first 8
    * corpus embeddings (stand-in for an offline-encoded subject table),
    * shipped via an explicit `sc.broadcast` — torrent-distributed ONCE
    * per executor, not serialized into every task closure; a
    * production-sized subject table (100k×768 ≈ 300 MB) makes the
    * difference between one transfer per executor and one per task
    * (VERDICT r8 #4). Each corpus vector gets its top-3 matches ≥ 0.38.
    * Rows-only + golden digest: vector algebra itself is oracle-covered
    * by sim_cosine_topk/sim_embed_neardup. */
  private val simSemanticMatch: Q = (s, d) => {
    import graft.functions.SemanticMatcher
    val subjectVecs = Tables.embeddings(s, d)
      .filter(col("vec_id") < 8)
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .toSeq
    val bcMatcher = s.sparkContext.broadcast(
      new SemanticMatcher(subjectVecs, threshold = 0.38, topK = 3))
    val matchUdf = udf((v: Seq[Float]) =>
      if (v == null) Seq.empty[(Int, Long)]
      else bcMatcher.value.matchVector(v.toArray).map { case (id, sim) =>
        (id, math.floor(sim * 10000).toLong)
      })
    Tables.embeddings(s, d)
      .select(col("vec_id"), explode(matchUdf(col("embedding"))).as("m"))
      .select(col("vec_id"), col("m._1").as("subject_id"), col("m._2").as("sim_e4"))
      .orderBy("vec_id", "subject_id")
      .transform(withGoldenDigest(_, d, "sim_semantic_match"))
  }

  // ------------------------------------------------------------ skew

  /** Skew-salted two-phase aggregation over a deliberately skewed key
    * (~70% of events funnel into one 'hot' key): phase 1 groups on
    * (key, salt) via [[graft.operators.SkewSalt.withSalt]] so the hot
    * key spreads across 8 reducers, phase 2 re-aggregates per-salt
    * partials. Counts and id-sums are LONGs, so the two-phase
    * re-association is exactly the single-phase result — the oracle
    * computes the plain one-shot aggregate. At 100 TB this is the shape
    * that keeps one executor from absorbing the hot key's entire
    * reducer input (AQE splits skewed SMJ sides but not skewed
    * aggregations). */
  private val aggSkewSalted: Q = (s, d) => {
    val skewed = Tables.events(s, d)
      .withColumn("skew_key",
        when(col("user_id") % 10 < 7, lit("hot"))
          .otherwise(concat(lit("u"), (col("user_id") % 100).cast("string"))))
      .select(col("skew_key"), col("event_id"))
    graft.operators.SkewSalt.withSalt(skewed, buckets = 8, saltSource = Seq("event_id"))
      .groupBy(col("skew_key"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum("event_id").as("ps"))
      .groupBy("skew_key")
      .agg(sum("pn").as("n"), sum("ps").as("sum_event_id"))
      .orderBy("skew_key")
  }

  // ------------------------------------------------------------ event-time window

  /** Tumbling event-time window aggregate (Structured-Streaming-shaped;
    * same plan works under readStream with a watermark — see
    * graft.streaming). Timestamps bucket to days, so the parquet
    * ns → Spark µs truncation is immaterial. */
  private val streamWindowAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")

  /** Heavy hitters per cohort through the custom
    * [[graft.expressions.TopKFreq]] TypedImperativeAggregate
    * (space-saving summary: O(capacity) memory per group, partial-agg
    * mergeable, never undercounts). Run in the exact regime (distinct
    * event types ≪ capacity) so DuckDB's exact top-3 hash-verifies it;
    * TopKFreqSpec pins the past-capacity error contract. The struct
    * list flattens to an `item:cnt|...` string for the battery — the
    * driver's pandas hash-compare can't sort array cells. ORACLE
    * CONTRACT: the flattening is unescaped, so it's only unambiguous
    * while items avoid ':' and '|' — fine for the enum-like event_type
    * fixture; free-form item strings would need a length-prefixed or
    * escaped encoding ON BOTH ENGINES. */
  private val aggTopkFreq: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy((col("user_id") % 10).as("cohort"))
      .agg(expr("graft_topk_freq(event_type, 3, 32)").as("tk"))
      .select(col("cohort"),
        expr("array_join(transform(tk, e -> concat(e.item, ':', e.cnt)), '|')")
          .as("top_events"))
      .orderBy("cohort")

  /** Mergeable-HLL distinct counts through the SKETCH-TABLE pattern
    * ([[graft.expressions.HllSketch]]): per-(event_type, day) sketches
    * — the shape a 100 TB pipeline PERSISTS as binary columns — roll up
    * per event_type via `graft_hll_merge` without touching raw events
    * again, exactly how cross-day rollups / late partitions /
    * incremental refresh work at scale (built-in approx_count_distinct
    * cannot persist or re-merge its state). Verification is two-layer:
    * the `est_ok` guard compares each estimate against the exact
    * countDistinct IN-PLAN and `raise_error`s beyond 500 bp (the
    * i7/golden-gate pattern — a broken sketch turns the battery row
    * red, not quietly wrong), and the hash-gated output columns are the
    * exact counts plus the survived guard, which DuckDB reproduces as
    * its own exact distincts + literal TRUE. Estimates are
    * deterministic (register max commutes; splitmix64 is seedless), so
    * the guard can be tight: measured errors here are ~0 bp for the
    * 150-user linear-counting regime and ≲ 200 bp for event_id at
    * p=12's 1.6% standard error. */
  private val aggHllDistinct: Q = (s, d) => {
    val events = Tables.events(s, d)
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"), col("event_id"))
      .groupBy("event_type", "day")
      .agg(expr("graft_hll_agg(user_id, 12)").as("user_sketch"),
        expr("graft_hll_agg(event_id, 12)").as("event_sketch"))
    val rolled = daily.groupBy("event_type")
      .agg(expr("graft_hll_est(graft_hll_merge(user_sketch))").as("users_est"),
        expr("graft_hll_est(graft_hll_merge(event_sketch))").as("events_est"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        countDistinct("event_id").as("n_events"))
    // multiplicative bound — no division, so the zero-count (all-NULL
    // keys) group degenerates to 0 <= 0 instead of a divide guard
    def within(est: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(est - n) * 10000 <= n * 500
    exact.join(rolled, "event_type")
      .select(col("event_type"), col("n_users"), col("n_events"),
        when(within(col("users_est"), col("n_users")) &&
          within(col("events_est"), col("n_events")), lit(true))
          .otherwise(raise_error(concat(
            lit("HLL estimate drift: "), col("event_type"),
            lit(" users "), col("users_est"), lit("/"), col("n_users"),
            lit(" events "), col("events_est"), lit("/"), col("n_events"))))
          .as("est_ok"))
      .orderBy("event_type")
  }

  /** COUNT-MIN frequency estimation — the frequency member of the
    * mergeable-sketch tier ([[graft.expressions.CmsAgg]]): one global
    * 4×256 counter sketch over every document token (map-side partial
    * merge, 8 KiB state at any corpus size), then the true top-20
    * tokens read their point estimates back out of the sketch with
    * `element_at` + `least` — min over the 4 row-salted hash cells.
    * The CMS contract (estimate ≥ true count, always) raises in-plan
    * on violation, and because the row-salted hash is the DuckDB-
    * replayable rolling fingerprint, the ESTIMATES themselves — not
    * just the exact counts — are oracle-pinned: a drift anywhere in
    * update/merge/eval flips the hash.
    *
    * Scale posture: the sketch is a single fixed-size aggregate (no
    * shuffle wider than one 8 KiB buffer per partition); the top-20 is
    * a TakeOrdered over the token partial-agg; the estimate probe is a
    * 20-row broadcast cross join. */
  private val aggCmsEstimate: Q = (s, d) => {
    val D = 4
    val W = 256
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toks.agg(expr(s"graft_cms_agg(tok, $D, $W)").as("cms"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("tok").asc).limit(20)
    val cells = (0 until D).map { dd =>
      expr(s"element_at(cms, CAST($dd * $W + " +
        s"graft_str_fp(concat('$dd|', tok)) % $W AS INT) + 1)")
    }
    top.crossJoin(broadcast(sketch))
      .withColumn("est_cnt", least(cells: _*))
      .select(col("tok"), col("true_cnt"),
        when(col("est_cnt") >= col("true_cnt"), col("est_cnt"))
          .otherwise(raise_error(concat(
            lit("CMS undercount: "), col("tok"), lit(" est "),
            col("est_cnt"), lit(" < true "), col("true_cnt"))))
          .as("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("tok").asc)
  }

  /** Mergeable-HISTOGRAM quantile rollup — the quantile sibling of the
    * persisted-HLL rollup above: exact global quantiles need a full
    * sort (a total exchange at 100 TB), but an equi-width histogram is
    * a fixed-size MONOID sketch — per-(source, bucket) counts add, so
    * partials from independent ingest batches merge into a persisted
    * TableMerge sketch table in O(sources × buckets) state regardless
    * of row volume, and any quantile reads off the cumulative counts.
    * Two halves of `documents` (doc_id parity) are aggregated
    * SEPARATELY and merged through the sketch table; the oracle
    * computes the same histogram in ONE pass over all docs — the merge
    * must be indistinguishable from the single pass, which is exactly
    * the mergeability contract. Bucket math is integer division
    * (n_chars div 200, capped at 29): both engines agree exactly.
    * p50/p90 are the bucket upper edges where cumulative count crosses
    * the rank — integer compares, no interpolation ambiguity. */
  private val aggHistQuantile: Q = (s, d) => {
    val stateDir = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.state.dir", "target/graft-state"))
    java.nio.file.Files.createDirectories(stateDir)
    val path = stateDir.resolve("agg_hist_quantile").toString
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
      least(expr("n_chars div 200"), lit(29L)).as("bucket"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("source", "bucket").agg(count(lit(1)).as("n"))
    TableMerge.createOrReplace(partial(docs.filter(col("doc_id") % 2 === 0)), path)
    val delta = partial(docs.filter(col("doc_id") % 2 === 1))
    val merged = delta.alias("dl")
      .join(TableMerge.read(s, path).alias("cur"), Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        (col("dl.n") + coalesce(col("cur.n"), lit(0L))).as("n"))
    TableMerge.upsert(s, path, merged, Seq("source", "bucket"))
    val w = Window.partitionBy("source").orderBy("bucket")
    val wAll = Window.partitionBy("source")
    TableMerge.read(s, path)
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(wAll))
      .groupBy("source")
      .agg(max("total").as("n_docs"),
        min(when(col("cum") * 2 >= col("total"), col("bucket"))).as("p50_bucket"),
        min(when(col("cum") * 10 >= col("total") * 9, col("bucket"))).as("p90_bucket"))
      .select(col("source"), col("n_docs"),
        col("p50_bucket"), ((col("p50_bucket") + 1) * 200).as("p50_upper"),
        col("p90_bucket"), ((col("p90_bucket") + 1) * 200).as("p90_upper"))
      .orderBy("source")
  }

  /** Batch sessionization — the gaps-and-islands twin of
    * [[graft.streaming.EventStreams.sessionize]]: a session breaks when
    * consecutive events of a user are more than `gapMs` apart; session
    * ids are the running count of breaks. Same 30-minute gap rule as
    * the streaming flatMapGroupsWithState version (whose spec pins the
    * open/close semantics) — this one is SQL-expressible, so the oracle
    * hash-pins it. Milliseconds on BOTH engines (unix_millis ↔
    * epoch_ms) — µs tails differ in the ns→µs conversion corners.
    * Shuffle key user_id, two stacked windows on the same sort — one
    * exchange, one sort. */
  private val sessionizeBatch: Q = (s, d) => {
    val gapMs = 1800 * 1000L
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("new_sess",
        when(lag("ms", 1).over(w).isNull ||
          col("ms") - lag("ms", 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("sess_seq", sum("new_sess").over(cum))
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"), min("ms").as("start_ms"), max("ms").as("end_ms"))
      .select(col("user_id"), col("sess_seq"), col("n_events"),
        col("start_ms"), col("end_ms"),
        floor((col("end_ms") - col("start_ms")) / 1000L).as("duration_s"))
      .orderBy("user_id", "sess_seq")
  }

  val queries: Seq[(String, Q)] = Seq(
    "subject_match_topk" -> subjectMatchTopk,
    "chunk_paragraph" -> chunkParagraph,
    "chunk_hierarchical" -> chunkHierarchical,
    "text_summarize" -> textSummarize,
    "sim_semantic_match" -> simSemanticMatch,
    "agg_skew_salted" -> aggSkewSalted,
    "agg_topk_freq" -> aggTopkFreq,
    "agg_hll_distinct" -> aggHllDistinct,
    "agg_cms_estimate" -> aggCmsEstimate,
    "agg_hist_quantile" -> aggHistQuantile,
    "stream_window_agg" -> streamWindowAgg,
    "sessionize_batch" -> sessionizeBatch,
  )

  val oracles: Map[String, String] = Map(
    "agg_skew_salted" ->
      """SELECT CASE WHEN user_id % 10 < 7 THEN 'hot'
        |  ELSE 'u' || CAST(user_id % 100 AS VARCHAR) END AS skew_key,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
        |FROM events GROUP BY skew_key ORDER BY skew_key""".stripMargin,
    "stream_window_agg" ->
      """SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    "agg_topk_freq" ->
      """WITH c AS (
        |  SELECT user_id % 10 AS cohort, event_type, count(*) AS cnt
        |  FROM events GROUP BY cohort, event_type),
        |r AS (
        |  SELECT cohort, event_type, cnt,
        |    row_number() OVER (PARTITION BY cohort
        |      ORDER BY cnt DESC, event_type) AS rn
        |  FROM c)
        |SELECT cohort,
        |  string_agg(event_type || ':' || CAST(cnt AS VARCHAR), '|'
        |    ORDER BY cnt DESC, event_type) AS top_events
        |FROM r WHERE rn <= 3 GROUP BY cohort ORDER BY cohort""".stripMargin,
    "agg_cms_estimate" ->
      s"""WITH tks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tks GROUP BY 1),
         |dd AS (SELECT * FROM (VALUES (0), (1), (2), (3)) v(d)),
         |cell AS (
         |  SELECT d, ${duckFp("CAST(d AS VARCHAR) || '|' || tok")} % 256 AS bkt,
         |    sum(n) AS cnt
         |  FROM tc, dd GROUP BY 1, 2),
         |top AS (SELECT tok, n FROM tc ORDER BY n DESC, tok ASC LIMIT 20),
         |est AS (
         |  SELECT t.tok, t.n, min(c.cnt) AS est
         |  FROM top t JOIN dd ON TRUE
         |  JOIN cell c ON c.d = dd.d
         |    AND c.bkt = ${duckFp("CAST(dd.d AS VARCHAR) || '|' || t.tok")} % 256
         |  GROUP BY 1, 2)
         |SELECT tok, n AS true_cnt, CAST(est AS BIGINT) AS est_cnt,
         |  CAST(est - n AS BIGINT) AS overcount
         |FROM est ORDER BY true_cnt DESC, tok ASC""".stripMargin,
    "agg_hll_distinct" ->
      // exact distincts + the guard EXPECTATION: the Spark side computes
      // est_ok from its sketches and raise_errors outside 500 bp, so a
      // sketch regression turns this row red before the hash is compared
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_events,
        |  TRUE AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_hist_quantile" ->
      // ONE-pass histogram over all docs — the merged two-batch sketch
      // must be indistinguishable from it (mergeability contract)
      """WITH b AS (
        |  SELECT source, least(n_chars // 200, 29) AS bucket FROM documents),
        |h AS (SELECT source, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |c AS (
        |  SELECT source, bucket, n,
        |    sum(n) OVER (PARTITION BY source ORDER BY bucket) AS cum,
        |    sum(n) OVER (PARTITION BY source) AS total
        |  FROM h)
        |SELECT source, CAST(max(total) AS BIGINT) AS n_docs,
        |  CAST(min(CASE WHEN cum * 2 >= total THEN bucket END) AS BIGINT)
        |    AS p50_bucket,
        |  CAST((min(CASE WHEN cum * 2 >= total THEN bucket END) + 1) * 200
        |    AS BIGINT) AS p50_upper,
        |  CAST(min(CASE WHEN cum * 10 >= total * 9 THEN bucket END) AS BIGINT)
        |    AS p90_bucket,
        |  CAST((min(CASE WHEN cum * 10 >= total * 9 THEN bucket END) + 1) * 200
        |    AS BIGINT) AS p90_upper
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |f AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
        |      OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |g AS (
        |  SELECT user_id, ms, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq
        |  FROM f)
        |SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ms) AS BIGINT) AS start_ms, CAST(max(ms) AS BIGINT) AS end_ms,
        |  CAST(floor((max(ms) - min(ms)) / 1000) AS BIGINT) AS duration_s
        |FROM g GROUP BY user_id, sess_seq ORDER BY user_id, sess_seq""".stripMargin,
  )
}
