package graft.queries

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed-flatMap row shape for S6 (top level for a stable Encoder). */
final case class OrderPriority(o_orderkey: Long, o_orderpriority: String)

/** Round-4 coverage battery: the SURVEY.md §2 rows that had library code
  * but no oracle-verified query — sources S2/S6/S7, sinks/filters
  * P4/J3/J5, cardinality+metrics A6/A8, top-k W2/O3, search Q1/Q4,
  * scalar batteries F5/F9/F12/F13/F17 as native-expression queries,
  * incremental I5/I7, a SQL-expressible sliding-window chunker (F18's
  * fixed-stride core), and binary/multimodal column plumbing.
  *
  * Determinism: same rules as [[CoreQueries]] (total ORDER BY, fixed-point
  * via floor, identical expression shapes on both engines). Integer
  * basis-point weighting replaces float weight sums where an IEEE
  * double grid could disagree across engines.
  */
object CoverageQueries {

  type Q = (SparkSession, String) => DataFrame

  private val StopSql = "('the', 'a', 'is', 'of', 'and', 'to', 'in')"


  // ---------------------------------------------------------------- sources

  /** S2 — file-lineage column via input_file_name
    * (transformer.py:1442-1443). At scale lineage rides along for free —
    * it's a per-split constant, no shuffle. */
  private val s2FileLineage: Q = (s, d) =>
    s.read.parquet(s"$d/nation.parquet")
      .select(element_at(split(input_file_name(), "/"), -1).as("file_name"))
      .groupBy("file_name").agg(count(lit(1)).as("n"))
      .orderBy("file_name")

  /** S6 — RDD→DF re-expressed as typed Dataset flatMap
    * (transformer.py:1505-1506): stays in Tungsten rows, no Python/RDD
    * serialization boundary. */
  private val s6TypedFlatmap: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d).select("o_orderkey", "o_orderpriority").as[OrderPriority]
      // Option: bronze-grade rows carry null priorities; a typed field
      // is not a non-null guarantee
      .flatMap(r => Option(r.o_orderpriority).getOrElse("")
        .split("-").map(t => (t, r.o_orderkey % 2)))
      .toDF("token", "key_parity")
      .groupBy("token")
      .agg(count(lit(1)).as("n"), sum("key_parity").as("n_odd"))
      .orderBy("token")
  }

  /** S7 — single-row generator union'd with a real aggregate
    * (gold_analytics.py:399-400 fallback date row). */
  private val s7SingleRow: Q = (s, d) => {
    val maxRow = Tables.orders(s, d)
      .agg(max(to_date(col("o_orderdate"))).as("dt"))
      .select(lit("max_order").as("src"), col("dt"))
    val fallback = s.range(1)
      .select(lit("fallback").as("src"), lit("2024-01-01").cast("date").as("dt"))
    maxRow.unionByName(fallback).orderBy("src")
  }

  // ---------------------------------------------------------------- filters/joins

  /** P4 — validity filter: title not null/empty/"Untitled"
    * (saf_exporter.py:260-264); titles synthesized deterministically. */
  private val p4ValidityFilter: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("title",
        when(col("doc_id") % 17 === 0, lit(null).cast("string"))
          .when(col("doc_id") % 13 === 0, lit(""))
          .when(col("doc_id") % 11 === 0, lit("Untitled"))
          .otherwise(concat_ws(" ", slice(split(col("text"), " "), 1, 3))))
      .filter(col("title").isNotNull && col("title") =!= "" && col("title") =!= "Untitled")
      .groupBy("source").agg(count(lit(1)).as("n_valid"))
      .orderBy("source")

  /** J3 — restrict detail rows to changed resources via inner join
    * (transformer.py:1696-1701). */
  private val j3ChangedRestrict: Q = (s, d) => {
    val changed = Tables.orders(s, d)
      .filter(col("o_orderkey") % 5 === 0).select("o_orderkey")
    Tables.lineitem(s, d)
      .join(changed, col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("l_returnflag")
  }

  /** J5 — documents ⨝ changed assets (transformer.py:2548-2552). */
  private val j5DocsChangedAssets: Q = (s, d) => {
    val changedAssets = Tables.embeddings(s, d)
      .filter(col("label") === 3).select("vec_id")
    Tables.documents(s, d)
      .join(changedAssets, col("doc_id") === col("vec_id"), "inner")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- aggregates/metrics

  /** A6 — global count / head(1) / isEmpty cardinality checks
    * (transformer.py:1658-1659, gold_analytics.py:192-195). The
    * driver-side actions are the operator; the one-row DF records them. */
  private val a6Cardinality: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val none = orders.filter(lit(false))
    // min over zero rows is NULL — surface it as the dim-key sentinel
    // (-1) instead of an NPE on the primitive getter
    val minRow = orders.agg(min("o_orderkey")).head()
    val minKey = if (minRow.isNullAt(0)) -1L else minRow.getLong(0)
    Seq((orders.count(), minKey, none.isEmpty, none.head(1).isEmpty))
      .toDF("n_rows", "min_key", "empty_is_empty", "head_empty")
  }

  /** A8 — metric accumulation via the Observation API (the Spark-native
    * replacement for the reference's per-partition diagnostics dicts,
    * transformer.py:1948-2021): metrics ride the existing job, no second
    * scan, no accumulator double-count on retries. */
  private val a8ObserveMetrics: Q = (s, d) => {
    import s.implicits._
    val obs = Observation("a8_metrics")
    val df = Tables.orders(s, d).observe(obs,
      count(lit(1)).as("n_rows"),
      round(sum("o_totalprice"), 2).as("total_price"),
      sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long],
      m("total_price").asInstanceOf[Double],
      m("n_finished").asInstanceOf[Long]))
      .toDF("n_rows", "total_price", "n_finished")
  }

  /** W2 — top-1 per key via max_by instead of a sort (latest-state
    * lookup, transformer.py:1339-1346). The ordering key is encoded to
    * one BIGINT (floor(x+0.5) — identical in both engines, unlike
    * double→long casts which truncate in Spark but round in DuckDB). */
  private val w2MaxBy: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("ord",
        floor(coalesce(round(col("value"), 2), lit(-1.0)) * 100 + 0.5).cast("long") *
          100000000L + col("event_id"))
      .groupBy("user_id")
      .agg(max_by(col("event_id"), col("ord")).as("top_event_id"))
      .orderBy("user_id")

  /** O3 — top-k (k=5) per group by score desc, id tiebreak
    * (transformer.py:475-476 top-5 subject matches). */
  private val o3TopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("source", "rk", "doc_id", "n_chars")
      .orderBy("source", "rk")
  }


  /** Q4 — keyword extraction: stopword strip, first-3 keywords
    * (chatbot_api.py:92-119). */
  private val q4Keywords: Q = (s, d) =>
    Tables.documents(s, d)
      .selectExpr("doc_id", s"filter(split(text, ' '), t -> NOT t IN $StopSql) AS kw")
      .selectExpr("doc_id", "size(kw) AS n_keywords",
        "concat_ws(' ', slice(kw, 1, 3)) AS top_keywords")
      .orderBy("doc_id")

  /** Q4 fidelity — query-expansion map before lexical scoring
    * (chatbot_api.py:174-185): a "book/textbook …" question has its
    * "of X" subject looked up in the expansion map; unknown subjects and
    * non-book questions pass through unchanged. Questions are
    * synthesized deterministically per doc; the full reference pattern
    * (Vietnamese keywords included) lives in
    * [[graft.functions.TextFunctions.expandQuery]] (spec-pinned) — the
    * battery query keeps to the ASCII subset both regex engines treat
    * identically. */
  private val q4QueryExpansion: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("question", element_at(array(
        lit("a book of math"), lit("find the textbook of database please"),
        lit("give me spark join notes"), lit("any book of physics")),
        (col("doc_id") % 4 + 1).cast("int")))
      .withColumn("subject",
        regexp_extract(col("question"), "\\b(?:of|cho)\\s+(\\w+)", 1))
      .withColumn("expanded",
        when(col("question").rlike("\\b(book|textbook)\\b"),
          when(col("subject") === "math",
            lit(graft.functions.TextFunctions.QueryExpansions("math")))
            .when(col("subject") === "database",
              lit(graft.functions.TextFunctions.QueryExpansions("database")))
            .otherwise(col("question")))
          .otherwise(col("question")))
      .select(col("doc_id"), col("question"), col("expanded"),
        size(split(col("expanded"), " ")).as("n_terms"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- scalar batteries

  /** F5 — ensure_language_code as a native expression chain
    * (transformer.py:190-202): alias map, 2-char truncate, 'en' default. */
  private val f5LangCode: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("raw", element_at(
        array(lit("English"), lit("vie"), lit("FR-fr"), lit(null).cast("string"), lit("VI")),
        (col("doc_id") % 5 + 1).cast("int")))
      .selectExpr(
        """CASE WHEN raw IS NULL OR trim(raw) = '' THEN 'en'
          |ELSE CASE lower(trim(raw))
          |  WHEN 'eng' THEN 'en' WHEN 'english' THEN 'en'
          |  WHEN 'vie' THEN 'vi' WHEN 'vietnamese' THEN 'vi'
          |  ELSE CASE WHEN length(lower(trim(raw))) >= 2
          |    THEN substring(lower(trim(raw)), 1, 2) ELSE 'en' END
          |END END AS lang_code""".stripMargin)
      .groupBy("lang_code").agg(count(lit(1)).as("n"))
      .orderBy("lang_code")

  /** F9 — multi-format datetime parsing via try_to_timestamp cascade
    * (transformer.py:250-278): per-format buckets, parse success counts.
    * Each parser is gated by a cheap `rlike` shape probe so a string only
    * reaches the parser whose format it can match — without the gates
    * every non-matching row pays the JVM exception path in up to 3
    * parsers (75% of rows fail ≥2 formats by construction; measured
    * 7.2 s → sub-second at sf0.1). try_to_timestamp stays inside the
    * gate so a shape-matching but invalid date still yields null rather
    * than an error. */
  private val f9ParseDatetime: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("raw",
        when(col("o_orderkey") % 4 === 0, date_format(col("o_orderdate"), "yyyy/MM/dd"))
          .when(col("o_orderkey") % 4 === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 4 === 2, date_format(col("o_orderdate"), "yyyy"))
          .otherwise(lit("not-a-date")))
      .withColumn("parsed", coalesce(
        when(col("raw").rlike("^\\d{4}/\\d{2}/\\d{2}$"),
          try_to_timestamp(col("raw"), lit("yyyy/MM/dd"))),
        when(col("raw").rlike("^\\d{4}-\\d{2}-\\d{2}$"),
          try_to_timestamp(col("raw"), lit("yyyy-MM-dd"))),
        when(col("raw").rlike("^\\d{4}$"),
          try_to_timestamp(col("raw"), lit("yyyy")))))
      .groupBy((col("o_orderkey") % 4).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("parsed").isNotNull, 1).otherwise(0)).as("n_parsed"),
        min(date_format(col("parsed"), "yyyy-MM-dd HH:mm:ss")).as("min_parsed"))
      .orderBy("bucket")

  /** F12 — canonical sorted-key JSON → sha256 record fingerprint as a
    * native expression (transformer.py:310-337; full 11-field variant
    * golden-tested in TextFunctionsSpec). */
  private val f12RecordFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("canonical", concat(
        lit("{\"language\": \""), col("lang"),
        lit("\", \"resource_id\": \""), col("doc_id").cast("string"),
        lit("\", \"source_system\": \""), col("source"), lit("\"}")))
      .select(col("doc_id"), sha2(col("canonical"), 256).as("fingerprint"))
      .orderBy("doc_id")

  /** F13 — weighted completeness quality score in integer basis points
    * (transformer.py:340-368; float grid avoided deliberately). */
  private val f13QualityWeights: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        (when(col("n_chars") > 0, 18).otherwise(0) +
          when(col("n_chars") >= 80, 22).otherwise(0) +
          when(col("lang").isNotNull && col("lang") =!= "", 5).otherwise(0) +
          when(col("source").isNotNull, 8).otherwise(0) +
          when(length(col("text")) >= 200, 12).otherwise(0) +
          when(size(split(col("text"), " ")) >= 50, 13).otherwise(0) +
          when(col("doc_id") % 3 > 0, 10).otherwise(0)).as("score_bp"))
      .withColumn("score_bp", least(col("score_bp"), lit(100)))
      .orderBy("doc_id")

  /** F17 — PDF-text whitespace normalization chain as native regexes
    * (transformer.py:689-695): de-hyphenate, CR→LF, collapse. */
  private val f17NormalizeWs: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("noisy", concat(lit("head-"), lit("\n  "), col("text"),
        lit("\r"), lit("\t tail")))
      .withColumn("n1", regexp_replace(col("noisy"), "-\\s*\\n\\s*", ""))
      .withColumn("n2", regexp_replace(col("n1"), "\r", "\n"))
      .withColumn("n3", regexp_replace(col("n2"), "[ \t]+", " "))
      .withColumn("n4", regexp_replace(col("n3"), "\n{3,}", "\n\n"))
      .select(col("doc_id"), length(trim(col("n4"))).as("clean_len"),
        sha2(trim(col("n4")), 256).as("clean_sha"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- incremental

  /** I5 — force-reprocess flag bypassing CDC (transformer.py:1145,
    * 1519-1521): both modes side by side. */
  private val i5ForceReprocess: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val cdc = orders.filter(col("o_orderkey") % 5 === 0)
      .agg(count(lit(1)).as("n_processed"))
      .select(lit("cdc").as("mode"), col("n_processed"))
    val force = orders.agg(count(lit(1)).as("n_processed"))
      .select(lit("force_all").as("mode"), col("n_processed"))
    cdc.unionByName(force).orderBy("mode")
  }

  /** I7 — zero-chunk invariant (transformer.py:2564-2627): chunk counts
    * per source with the hard-failure predicate materialized. */
  private val i7ZeroChunkInvariant: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"),
        ceil(greatest(col("n_chars") - lit(40), lit(1)).cast("double") / 160.0)
          .cast("long").as("n_chunks_doc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_candidates"), sum("n_chunks_doc").as("n_chunks"))
      .withColumn("invariant_ok", !(col("n_chunks") === 0 && col("n_candidates") > 0))
      .orderBy("source")

  // ---------------------------------------------------------------- chunking / multimodal

  /** F18 core — fixed-stride sliding-window chunker as a pure
    * generator expression (max 200 chars, stride 160): per-doc chunk
    * count, coverage chars, boundary checks. The boundary-snapping
    * variant lives in graft.chunk.Chunker (property-tested); this is the
    * SQL-expressible skeleton both engines can verify. */
  private val chunkSliding: Q = (s, d) =>
    Tables.documents(s, d)
      .selectExpr("doc_id",
        "CAST(ceil(CAST(greatest(length(text) - 40, 1) AS DOUBLE) / 160.0D) AS BIGINT) AS n_chunks",
        "transform(sequence(0, CAST(ceil(CAST(greatest(length(text) - 40, 1) AS DOUBLE) / 160.0D) AS INT) - 1), " +
          "i -> substring(text, i * 160 + 1, 200)) AS chunks")
      .selectExpr("doc_id", "n_chunks",
        "aggregate(chunks, CAST(0 AS BIGINT), (acc, c) -> acc + length(c)) AS total_chunk_chars",
        "length(element_at(chunks, -1)) AS last_chunk_len")
      .orderBy("doc_id")

  /** Multimodal decode — opaque binary columns through the REAL header
    * parsers (r9): each document becomes a well-formed PNG / JPEG / WAV
    * container (doc_id%4 picks the format; MediaFixtures writes
    * spec-exact headers with dims/rate/frames derived from doc_id and
    * the text payload), and [[graft.multimodal.MediaStub.decodeMeta]]
    * parses them back per-partition. The oracle predicts every decoded
    * field arithmetically — a parser bug (endianness, offset, chunk
    * walk, box framing) breaks the hash row, not just a spec. */
  /** Shared media fixture: every document becomes a well-formed
    * container (PNG/JPEG/WAV/MP4 round-robin by doc_id % 4) whose header
    * fields are pure doc_id arithmetic, so every downstream decode /
    * sample / resize value is oracle-predictable. */
  private def mediaRecords(s: SparkSession, d: String) = {
    import s.implicits._
    import graft.multimodal.MediaFixtures
    import graft.multimodal.MediaStub.MediaRecord
    Tables.documents(s, d)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val payload = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id % 4) match {
          case 0 => MediaRecord(id,
            MediaFixtures.png((id % 624 + 16).toInt, (id % 464 + 16).toInt, payload),
            "image/png")
          case 1 => MediaRecord(id,
            MediaFixtures.jpeg((id % 624 + 16).toInt, (id % 464 + 16).toInt, payload),
            "image/jpeg")
          case 2 => MediaRecord(id,
            MediaFixtures.wav((8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt,
              payload.length),
            "audio/wav")
          case _ => MediaRecord(id,
            MediaFixtures.mp4((id % 624 + 16).toInt, (id % 464 + 16).toInt,
              (id % 240 + 1).toInt, payload),
            "video/mp4")
        }
      }
  }

  private val mmBinaryMeta: Q = (s, d) => {
    import graft.multimodal.MediaStub
    MediaStub.decodeMeta(mediaRecords(s, d))
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
        col("n_frames"), col("sample_rate"), col("channels"))
      .orderBy("doc_id")
  }

  /** Frame sampling + resize planning over the decoded media metadata —
    * the two mapPartitions plumbing stages downstream of `mm_binary_meta`
    * that an extraction pipeline actually branches on: every-3rd-frame
    * refs (count + last byte offset from the fixed-stride layout) and
    * the aspect-preserving 128×128 fit (never upscale, floor to pixels,
    * fixed-point scale). Audio rows sample their PCM frames; images are
    * single-frame; zero-frame assets (empty payload) degrade to 0/-1.
    * Every value is doc_id arithmetic, so the oracle predicts the whole
    * row — geometry bugs break the hash, not just a spec. */
  private val mmFrameResize: Q = (s, d) => {
    import graft.multimodal.MediaStub
    val meta = MediaStub.decodeMeta(mediaRecords(s, d))
    val frames = MediaStub.sampleFrames(meta, everyN = 3)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max("byte_offset").as("last_offset"))
    val resize = MediaStub.planResize(meta, maxW = 128, maxH = 128)
      .select(col("doc_id"), col("out_width").cast("long").as("out_width"),
        col("out_height").cast("long").as("out_height"), col("scale_e4"))
    meta.select("doc_id")
      .join(frames, Seq("doc_id"), "left")
      .join(resize, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("last_offset"), lit(-1L)).as("last_offset"),
        coalesce(col("out_width"), lit(-1L)).as("out_width"),
        coalesce(col("out_height"), lit(-1L)).as("out_height"),
        coalesce(col("scale_e4"), lit(-1L)).as("scale_e4"))
      .orderBy("doc_id")
  }

  /** Quality-log battery entry — the MAP<STRING,STRING> `details`
    * column the reference's quality_log carries
    * (`create_schema.py:395-410`), exercised end-to-end: three
    * predicate checks over two tables run through
    * [[graft.operators.QualityChecks]] (one fused aggregate pass per
    * table), and the map column flattens to a sorted `k=v|...` string
    * (sorted map_entries, then joined) so the hash compare is
    * entry-order-deterministic AND scalar — the driver's pandas
    * compare can't sort array cells. The events range check
    * FAILS by construction (events.value tops out near 490, well over
    * the 400 bound), pinning both check_result branches — note
    * events.value has NO nulls in the fixture, so a null check would
    * silently never exercise the failed branch. */
  private val qcQualityLog: Q = (s, d) => {
    import graft.operators.QualityChecks
    import graft.operators.QualityChecks.Check
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val orders = QualityChecks.run(Tables.orders(s, d), "orders", Seq(
      Check("orders_status_valid", "domain", col("o_orderstatus").isin("O", "F", "P")),
      Check("orders_price_positive", "range", col("o_totalprice") > 0)), ts)
    val events = QualityChecks.run(Tables.events(s, d), "events", Seq(
      Check("events_value_range", "range", col("value") < 400)), ts)
    orders.unionByName(events)
      .select(col("check_id"), col("table_name"), col("check_type"),
        col("check_result"), col("passed_count"), col("failed_count"),
        col("check_timestamp"),
        expr("array_join(transform(array_sort(map_entries(details)), " +
          "e -> concat(e.key, '=', e.value)), '|')").as("details"))
      .orderBy("table_name", "check_id")
  }

  /** Numeric column profiler — the stats pass a lakehouse runs on every
    * ingest (the engine-side generalization of the reference's table
    * validation counts): row/null/NDV anchors plus a 10-bin equi-width
    * histogram. Two scans (bounds, then binning) — both single
    * partial-agg passes; the 1-row bounds attach via broadcast, and the
    * bin is the SAME manual float expression on both engines (DuckDB
    * has no width_bucket; identical IEEE ops beat equivalent-but-
    * different builtins for hash parity). Min/max per bin fixed-pointed
    * to cents with the floor(+0.5) grid rule. */
  private val profileNumeric: Q = (s, d) => {
    val bins = 10
    val ev = Tables.events(s, d).select(col("value").as("x"))
    val stats = ev.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("x").isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct("x").as("ndv"),
      min("x").as("lo"), max("x").as("hi"))
    ev.filter(col("x").isNotNull)
      .crossJoin(broadcast(stats))
      .withColumn("bin", (least(lit(bins - 1), greatest(lit(0),
        floor((col("x") - col("lo")) * bins / (col("hi") - col("lo"))))) + 1).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        floor(min("x") * 100 + 0.5).cast("long").as("min_cents"),
        floor(max("x") * 100 + 0.5).cast("long").as("max_cents"),
        first("n_total").as("n_total"), first("n_null").as("n_null"),
        first("ndv").as("ndv"))
      .orderBy("bin")
  }

  /** Z-order clustering key — the multi-dimensional data-skipping
    * layout: interleaving the bits of two sort dimensions makes every
    * contiguous z-range (≈ one output file after a z-sorted write)
    * cover a BOUNDED rectangle in (custkey, order-day) space, so
    * min/max file stats prune scans filtered on EITHER dimension — a
    * single-column sort leaves the second dimension's per-file range
    * unbounded. The query emits per-z-bucket extents (the rectangles
    * the skipping argument rests on); at 100 TB the same z expression
    * feeds `repartitionByRange(z).sortWithinPartitions(z)` before the
    * write. Straight-line integer bit arithmetic on both engines. */
  /** Hilbert-curve clustering key — the locality-improved sibling of
    * `layout_zorder` (the curve Delta/Iceberg clustering literature
    * prefers: unlike Z, the Hilbert curve never jumps across the
    * space, so equal-count buckets cover tighter rectangles — measured
    * against z-order on the same normalized dims in LayoutSpec). The
    * classic iterative xy→d walk (rotate-and-accumulate per bit level,
    * the public-domain algorithm) is UNROLLED: 8 bit levels become 8
    * chained projections emitted by one Scala builder for BOTH engines
    * — the same discipline as the k-means/BPE loop unrolls, so every
    * rotation step is under the oracle hash. Pure per-row integer
    * arithmetic inside codegen; the groupBy is the only shuffle. */
  /** Emits the 8 unrolled xy→d Hilbert levels as chained sub-selects
    * (innermost = level s=128). `xor` abstracts the one syntax the two
    * engines disagree on (Spark `a ^ b`, DuckDB `xor(a, b)`); every
    * other token is common SQL. Grid is 256×256 (order 8). */
  private[graft] def hilbertWalkSql(from: String,
                                      xor: (String, String) => String): String =
    Seq(128, 64, 32, 16, 8, 4, 2, 1).foldLeft(
      s"SELECT x, y, x AS ox, y AS oy, CAST(0 AS BIGINT) AS hd FROM $from") {
      (inner, s) =>
        s"""SELECT
           |  hd + ${s.toLong * s} * ${xor("(3 * rx)", "ry")} AS hd,
           |  CASE WHEN ry = 1 THEN x WHEN rx = 0 THEN y ELSE 255 - y END AS x,
           |  CASE WHEN ry = 1 THEN y WHEN rx = 0 THEN x ELSE 255 - x END AS y,
           |  ox, oy
           |FROM (
           |  SELECT hd, x, y, ox, oy,
           |    CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           |    CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
           |  FROM ($inner))""".stripMargin
    }

  /** Hilbert extents query body shared by the battery entry and
    * LayoutSpec's locality measurement. */
  private[graft] def hilbertExtents(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      s"""WITH pts AS (
         |  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         |    CAST(datediff(o_orderdate, DATE '1992-01-01') % 256 AS BIGINT) AS y
         |  FROM orders),
         |h AS (${hilbertWalkSql("pts", (a, b) => s"($a ^ $b)")})
         |SELECT CAST(hd DIV 1024 AS BIGINT) AS h_bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(ox) AS BIGINT) AS min_x, CAST(max(ox) AS BIGINT) AS max_x,
         |  CAST(min(oy) AS BIGINT) AS min_y, CAST(max(oy) AS BIGINT) AS max_y
         |FROM h GROUP BY h_bucket ORDER BY h_bucket""".stripMargin)
  }

  private val layoutHilbert: Q = (s, d) => hilbertExtents(s, d)

  private val layoutZorder: Q = (s, d) => {
    val sparkZ = (0 until 16).map(i =>
      s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})")
      .mkString("(", " + ", ")")
    Tables.orders(s, d)
      .selectExpr(
        "CAST(o_custkey % 65536 AS BIGINT) AS x",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') % 65536 AS BIGINT) AS y")
      .selectExpr("x", "y", s"$sparkZ AS z")
      .groupBy(shiftright(col("z"), 20).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("z_bucket")
  }

  // ---------------------------------------------------------------- registry

  val queries: Seq[(String, Q)] = SearchQueries.queries ++ Seq(
    "s2_file_lineage" -> s2FileLineage,
    "s6_typed_flatmap" -> s6TypedFlatmap,
    "s7_single_row" -> s7SingleRow,
    "p4_validity_filter" -> p4ValidityFilter,
    "j3_changed_restrict" -> j3ChangedRestrict,
    "j5_docs_changed_assets" -> j5DocsChangedAssets,
    "a6_cardinality" -> a6Cardinality,
    "a8_observe_metrics" -> a8ObserveMetrics,
    "w2_max_by" -> w2MaxBy,
    "o3_topk_per_group" -> o3TopkPerGroup,
    "q4_keywords" -> q4Keywords,
    "q4_query_expansion" -> q4QueryExpansion,
    "f5_lang_code" -> f5LangCode,
    "f9_parse_datetime" -> f9ParseDatetime,
    "f12_record_fingerprint" -> f12RecordFingerprint,
    "f13_quality_weights" -> f13QualityWeights,
    "f17_normalize_ws" -> f17NormalizeWs,
    "i5_force_reprocess" -> i5ForceReprocess,
    "i7_zero_chunk_invariant" -> i7ZeroChunkInvariant,
    "chunk_sliding" -> chunkSliding,
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_frame_resize" -> mmFrameResize,
    "qc_quality_log" -> qcQualityLog,
    "profile_numeric" -> profileNumeric,
    "layout_zorder" -> layoutZorder,
    "layout_hilbert" -> layoutHilbert,
  )

  val oracles: Map[String, String] = SearchQueries.oracles ++ Map(
    "layout_hilbert" -> {
      s"""WITH pts AS (
         |  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) % 256
         |      AS BIGINT) AS y
         |  FROM orders),
         |h AS (${hilbertWalkSql("pts", (a, b) => s"xor($a, $b)")})
         |SELECT CAST(hd // 1024 AS BIGINT) AS h_bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(ox) AS BIGINT) AS min_x, CAST(max(ox) AS BIGINT) AS max_x,
         |  CAST(min(oy) AS BIGINT) AS min_y, CAST(max(oy) AS BIGINT) AS max_y
         |FROM h GROUP BY h_bucket ORDER BY h_bucket""".stripMargin
    },
    "layout_zorder" -> {
      val duckZ = (0 until 16).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString("(", " + ", ")")
      s"""WITH b AS (
         |  SELECT CAST(o_custkey % 65536 AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) % 65536 AS BIGINT) AS y
         |  FROM orders),
         |z AS (SELECT x, y, $duckZ AS z FROM b)
         |SELECT CAST(z >> 20 AS BIGINT) AS z_bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
    },
    "profile_numeric" ->
      """WITH s AS (
        |  SELECT count(*) AS n_total,
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
        |    count(DISTINCT value) AS ndv,
        |    min(value) AS lo, max(value) AS hi
        |  FROM events),
        |b AS (
        |  SELECT CAST(least(9, greatest(0,
        |      floor((value - lo) * 10 / (hi - lo)))) + 1 AS INT) AS bin,
        |    value, n_total, n_null, ndv
        |  FROM events, s WHERE value IS NOT NULL)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(floor(min(value) * 100 + 0.5) AS BIGINT) AS min_cents,
        |  CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS max_cents,
        |  CAST(max(n_total) AS BIGINT) AS n_total,
        |  CAST(max(n_null) AS BIGINT) AS n_null,
        |  CAST(max(ndv) AS BIGINT) AS ndv
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "qc_quality_log" ->
      """WITH o AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS p_status,
        |    sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS p_price
        |  FROM orders),
        |e AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN value < 400 THEN 1 ELSE 0 END) AS p_val
        |  FROM events),
        |checks AS (
        |  SELECT 'orders_status_valid' AS check_id, 'orders' AS table_name,
        |    'domain' AS check_type, p_status AS passed, n FROM o
        |  UNION ALL SELECT 'orders_price_positive', 'orders', 'range', p_price, n FROM o
        |  UNION ALL SELECT 'events_value_range', 'events', 'range', p_val, n FROM e)
        |SELECT check_id, table_name, check_type,
        |  CASE WHEN n - passed = 0 THEN 'passed' ELSE 'failed' END AS check_result,
        |  CAST(passed AS BIGINT) AS passed_count,
        |  CAST(n - passed AS BIGINT) AS failed_count,
        |  TIMESTAMP '2024-01-01 00:00:00' AS check_timestamp,
        |  'pass_rate_bp=' || CAST(CAST(floor(passed * 10000 / n) AS BIGINT) AS VARCHAR)
        |    || '|rows_checked=' || CAST(n AS VARCHAR) AS details
        |FROM checks ORDER BY table_name, check_id""".stripMargin,
    "s2_file_lineage" ->
      """SELECT 'nation.parquet' AS file_name, CAST(count(*) AS BIGINT) AS n
        |FROM nation ORDER BY file_name""".stripMargin,
    "s6_typed_flatmap" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(o_orderpriority, '-')) AS token,
        |    o_orderkey % 2 AS key_parity
        |  FROM orders)
        |SELECT token, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(key_parity) AS BIGINT) AS n_odd
        |FROM toks GROUP BY token ORDER BY token""".stripMargin,
    "s7_single_row" ->
      """SELECT 'max_order' AS src, CAST(max(o_orderdate) AS DATE) AS dt FROM orders
        |UNION ALL SELECT 'fallback' AS src, DATE '2024-01-01' AS dt
        |ORDER BY src""".stripMargin,
    "p4_validity_filter" ->
      """WITH t AS (
        |  SELECT source, CASE
        |    WHEN doc_id % 17 = 0 THEN NULL
        |    WHEN doc_id % 13 = 0 THEN ''
        |    WHEN doc_id % 11 = 0 THEN 'Untitled'
        |    ELSE array_to_string(string_split(text, ' ')[1:3], ' ') END AS title
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_valid
        |FROM t WHERE title IS NOT NULL AND title <> '' AND title <> 'Untitled'
        |GROUP BY source ORDER BY source""".stripMargin,
    "j3_changed_restrict" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 5 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j5_docs_changed_assets" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |WHERE label = 3
        |GROUP BY source ORDER BY source""".stripMargin,
    "a6_cardinality" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  TRUE AS empty_is_empty, TRUE AS head_empty
        |FROM orders""".stripMargin,
    "a8_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_finished
        |FROM orders""".stripMargin,
    "w2_max_by" ->
      """WITH keyed AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(coalesce(round(value, 2), -1.0) * 100 + 0.5) AS BIGINT)
        |      * 100000000 + event_id AS ord
        |  FROM events)
        |SELECT user_id, max_by(event_id, ord) AS top_event_id
        |FROM keyed GROUP BY user_id ORDER BY user_id""".stripMargin,
    "o3_topk_per_group" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars
        |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q4_query_expansion" ->
      // expansion strings interpolated from TextFunctions.QueryExpansions
      // (the spec-pinned source of truth) so all three copies of the map
      // — Scala function, Spark query, oracle — cannot drift
      s"""WITH q AS (
         |  SELECT doc_id,
         |    (['a book of math', 'find the textbook of database please',
         |      'give me spark join notes', 'any book of physics'])[CAST(doc_id % 4 + 1 AS INT)]
         |      AS question
         |  FROM documents),
         |e AS (
         |  SELECT doc_id, question,
         |    CASE WHEN regexp_matches(question, '\\b(book|textbook)\\b')
         |      THEN CASE regexp_extract(question, '\\b(?:of|cho)\\s+(\\w+)', 1)
         |        WHEN 'math' THEN '${graft.functions.TextFunctions.QueryExpansions("math")}'
         |        WHEN 'database' THEN '${graft.functions.TextFunctions.QueryExpansions("database")}'
         |        ELSE question END
         |      ELSE question END AS expanded
         |  FROM q)
         |SELECT doc_id, question, expanded,
         |  CAST(len(string_split(expanded, ' ')) AS INT) AS n_terms
         |FROM e ORDER BY doc_id""".stripMargin,
    "q4_keywords" ->
      s"""WITH kw AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), t -> NOT t IN $StopSql) AS kw
         |  FROM documents)
         |SELECT doc_id, CAST(len(kw) AS INT) AS n_keywords,
         |  array_to_string(kw[1:3], ' ') AS top_keywords
         |FROM kw ORDER BY doc_id""".stripMargin,
    "f5_lang_code" ->
      """WITH r AS (
        |  SELECT (['English', 'vie', 'FR-fr', NULL, 'VI'])[CAST(doc_id % 5 + 1 AS INT)]
        |    AS raw
        |  FROM documents),
        |coded AS (
        |  SELECT CASE WHEN raw IS NULL OR trim(raw) = '' THEN 'en'
        |  ELSE CASE lower(trim(raw))
        |    WHEN 'eng' THEN 'en' WHEN 'english' THEN 'en'
        |    WHEN 'vie' THEN 'vi' WHEN 'vietnamese' THEN 'vi'
        |    ELSE CASE WHEN length(lower(trim(raw))) >= 2
        |      THEN substring(lower(trim(raw)), 1, 2) ELSE 'en' END
        |  END END AS lang_code FROM r)
        |SELECT lang_code, CAST(count(*) AS BIGINT) AS n
        |FROM coded GROUP BY lang_code ORDER BY lang_code""".stripMargin,
    "f9_parse_datetime" ->
      """WITH r AS (
        |  SELECT o_orderkey % 4 AS bucket,
        |    CASE o_orderkey % 4
        |      WHEN 0 THEN strftime(o_orderdate, '%Y/%m/%d')
        |      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 2 THEN strftime(o_orderdate, '%Y')
        |      ELSE 'not-a-date' END AS raw
        |  FROM orders),
        |p AS (
        |  SELECT bucket, coalesce(
        |    try_strptime(raw, '%Y/%m/%d'),
        |    try_strptime(raw, '%Y-%m-%d'),
        |    try_strptime(raw, '%Y')) AS parsed
        |  FROM r)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN parsed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
        |  min(strftime(parsed, '%Y-%m-%d %H:%M:%S')) AS min_parsed
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin,
    "f12_record_fingerprint" ->
      """SELECT doc_id, sha256('{"language": "' || lang || '", "resource_id": "'
        |  || CAST(doc_id AS VARCHAR) || '", "source_system": "' || source || '"}')
        |  AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f13_quality_weights" ->
      """SELECT doc_id, CAST(least(
        |    (CASE WHEN n_chars > 0 THEN 18 ELSE 0 END)
        |  + (CASE WHEN n_chars >= 80 THEN 22 ELSE 0 END)
        |  + (CASE WHEN lang IS NOT NULL AND lang <> '' THEN 5 ELSE 0 END)
        |  + (CASE WHEN source IS NOT NULL THEN 8 ELSE 0 END)
        |  + (CASE WHEN length(text) >= 200 THEN 12 ELSE 0 END)
        |  + (CASE WHEN len(string_split(text, ' ')) >= 50 THEN 13 ELSE 0 END)
        |  + (CASE WHEN doc_id % 3 > 0 THEN 10 ELSE 0 END), 100) AS INT) AS score_bp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f17_normalize_ws" ->
      """WITH n AS (
        |  SELECT doc_id, trim(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace('head-' || chr(10) || '  ' || text || chr(13)
        |            || chr(9) || ' tail',
        |            '-\s*\n\s*', '', 'g'),
        |          '\r', chr(10), 'g'),
        |        '[ \t]+', ' ', 'g'),
        |      '\n{3,}', chr(10) || chr(10), 'g')) AS clean
        |  FROM documents)
        |SELECT doc_id, CAST(length(clean) AS INT) AS clean_len,
        |  sha256(clean) AS clean_sha
        |FROM n ORDER BY doc_id""".stripMargin,
    "i5_force_reprocess" ->
      """SELECT 'cdc' AS mode, CAST(count(*) AS BIGINT) AS n_processed
        |FROM orders WHERE o_orderkey % 5 = 0
        |UNION ALL
        |SELECT 'force_all' AS mode, CAST(count(*) AS BIGINT) AS n_processed
        |FROM orders ORDER BY mode""".stripMargin,
    "i7_zero_chunk_invariant" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CAST(ceil(CAST(greatest(n_chars - 40, 1) AS DOUBLE) / 160.0)
        |    AS BIGINT)) AS BIGINT) AS n_chunks,
        |  NOT (sum(CAST(ceil(CAST(greatest(n_chars - 40, 1) AS DOUBLE) / 160.0)
        |    AS BIGINT)) = 0 AND count(*) > 0) AS invariant_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "chunk_sliding" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(ceil(CAST(greatest(length(text) - 40, 1) AS DOUBLE) / 160.0)
        |      AS BIGINT) AS n_chunks,
        |    list_transform(
        |      generate_series(0, CAST(ceil(CAST(greatest(length(text) - 40, 1)
        |        AS DOUBLE) / 160.0) AS INT) - 1),
        |      i -> substring(text, CAST(i * 160 + 1 AS INT), 200)) AS chunks
        |  FROM documents)
        |SELECT doc_id, n_chunks,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(chunks, c2 -> CAST(length(c2) AS BIGINT))),
        |    (a, x) -> a + x) AS total_chunk_chars,
        |  CAST(length(chunks[-1]) AS INT) AS last_chunk_len
        |FROM c ORDER BY doc_id""".stripMargin,
    // Budgets mirror MediaFixtures: PNG = 33+payload, JPEG = 23+payload,
    // WAV = 44 + frames*channels*2 with frames = payload bytes,
    // MP4 = 288+payload (fixed ftyp+moov tree + mdat header); dims,
    // rate/channels and the MP4 stts frame count are the same doc_id
    // arithmetic the fixture encodes.
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'image/jpeg' WHEN 2 THEN 'audio/wav'
        |    ELSE 'video/mp4' END AS mime,
        |  CAST(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 33 + octet_length(encode(text))
        |    WHEN 1 THEN 23 + octet_length(encode(text))
        |    WHEN 2 THEN 44 + octet_length(encode(text)) * (1 + doc_id % 2) * 2
        |    ELSE 288 + octet_length(encode(text))
        |    END AS INT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 0
        |    ELSE doc_id % 624 + 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 0
        |    ELSE doc_id % 464 + 16 END AS INT) AS height,
        |  CAST(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 2 THEN octet_length(encode(text))
        |    WHEN 3 THEN doc_id % 240 + 1
        |    ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 8000 + (doc_id % 8) * 1000
        |    ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 1 + doc_id % 2
        |    ELSE 0 END AS INT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(CASE CAST(doc_id % 4 AS INT)
        |      WHEN 2 THEN octet_length(encode(text))
        |      WHEN 3 THEN doc_id % 240 + 1
        |      ELSE 1 END AS BIGINT) AS n_frames,
        |    CAST(CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 33 + octet_length(encode(text))
        |      WHEN 1 THEN 23 + octet_length(encode(text))
        |      WHEN 2 THEN 44 + octet_length(encode(text)) * (1 + doc_id % 2) * 2
        |      ELSE 288 + octet_length(encode(text))
        |      END AS BIGINT) AS n_bytes,
        |    CASE WHEN doc_id % 4 = 2 THEN 0 ELSE doc_id % 624 + 16 END AS w,
        |    CASE WHEN doc_id % 4 = 2 THEN 0 ELSE doc_id % 464 + 16 END AS h
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN n_frames > 0 THEN (n_frames + 2) // 3 ELSE 0 END AS n_sampled,
        |    CASE WHEN n_frames > 0
        |      THEN (3 * ((n_frames - 1) // 3)) * greatest(1, n_bytes // n_frames)
        |      ELSE -1 END AS last_offset
        |  FROM m),
        |r AS (
        |  SELECT doc_id,
        |    least(CAST(1 AS DOUBLE),
        |      least(CAST(128 AS DOUBLE) / w, CAST(128 AS DOUBLE) / h)) AS scale
        |  FROM m WHERE w > 0)
        |SELECT m.doc_id,
        |  CAST(f.n_sampled AS BIGINT) AS n_sampled,
        |  CAST(f.last_offset AS BIGINT) AS last_offset,
        |  CASE WHEN r.doc_id IS NULL THEN -1
        |    ELSE CAST(greatest(1, floor(m.w * r.scale)) AS BIGINT) END AS out_width,
        |  CASE WHEN r.doc_id IS NULL THEN -1
        |    ELSE CAST(greatest(1, floor(m.h * r.scale)) AS BIGINT) END AS out_height,
        |  CASE WHEN r.doc_id IS NULL THEN -1
        |    ELSE CAST(floor(r.scale * 10000) AS BIGINT) END AS scale_e4
        |FROM m JOIN f USING (doc_id) LEFT JOIN r USING (doc_id)
        |ORDER BY m.doc_id""".stripMargin,
  )
}
