package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-tier plumbing for the LLM-pipeline query files (split from the
  * single 2,300-line PipelineQueries in r10 — pure mechanical move, no
  * query or oracle changed): the portable rolling fingerprint both
  * engines replicate, the embedding fold expressions and their DuckDB
  * twins, the shared stopword list, and the pinned-golden-digest gate
  * for rows-only entries. Everything here is referenced from at least
  * two tier files; single-tier constants live with their tier.
  */
private[graft] object PipelineShared {

  type Q = (SparkSession, String) => DataFrame

  val P = 2147483647L // 31-bit Mersenne prime, DuckDB-replicable

  /** Session-lifetime memo for expensive derived ARTIFACTS (the
    * checkpointed HNSW neighbor table, trained OPQ codebooks …):
    * several registry entries serve from the same build — exactly as
    * production serves many queries from one maintained index — so
    * queries sharing a JVM share the build instead of re-running the
    * banded candidate join / training loop per query (VERDICT r15 #5).
    * Keyed by (session, key): a restarted session can never see a
    * stale frame, and every build is a pure deterministic function of
    * the keyed inputs, so reuse cannot change any result — only skip
    * recomputing it. */
  private val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), AnyRef]()
  /** Test hook: DeterminismSpec clears the memo between its two
    * shuffle-partition runs so the BUILDS re-run under both widths —
    * otherwise the second run would reuse the first's checkpoint and
    * the sweep would no longer prove build partition-independence. */
  private[graft] def clearMemo(): Unit = artifactCache.clear()
  def memo[T <: AnyRef](s: SparkSession, key: String)(build: => T): T = {
    val k = (s, key)
    val cur = artifactCache.get(k)
    if (cur != null) cur.asInstanceOf[T]
    else {
      val v = build // deterministic; a racing double-build is harmless
      val prev = artifactCache.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  /** Overlap independent eager builds on the driver pool — see
    * [[graft.Par.inParallel]] (guide §2.6). */
  def inParallel[T](thunks: Seq[() => T]): Seq[T] = graft.Par.inParallel(thunks)

  /** Portable rolling char-fold fingerprint of a string expression
    * (F11-lite): fold `acc*31 + ascii(char) mod P` seeded with 7, over
    * the char array from `split(x, '')`. The char-array form is O(n) —
    * the earlier `sequence(1,len)` + `substr(x,i,1)` fold re-traversed
    * the UTF-8 string per char (O(n²), 14.5s on sf0.1 text_fingerprint)
    * — and both engines agree that `split('', '') = ['']` with
    * `ascii('') = 0`, so the empty-string case is engine-independent too.
    *
    * Spark-version sensitivity (ADVICE r3): the no-trailing-empty
    * behavior of empty-regex split was verified on the pinned Spark
    * 4.1.2 (split('a','')=['a']) and differs from raw Java
    * `String.split(re, -1)` — an engine upgrade must re-run the
    * empty/non-ASCII fingerprint checks before trusting stored hashes.
    */
  def duckFp(x: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($x, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, x) -> (a * 31 + x) % $P)"

  val sumExpr =
    s"aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"
  val sumSqExpr =
    s"aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"

  val Stopwords = Seq("the", "a", "is", "of", "and", "to", "in")
  val StopwordsSql = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
  val StopwordsCsv = Stopwords.mkString(",")

  val duckSum =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, " +
      "x -> CAST(x AS DOUBLE))), (a, x) -> a + x)"
  val duckSumSq =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)"

  def duckSumSqOf(emb: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform($emb, " +
      "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)"


  // ------------------------------------------------ winnowing kernels

  /** Winnowing k-gram hash array over a `tokens` column (Schleimer et
    * al. 2003): element i is the mod-P char-fold hash of tokens
    * [i, i+k-1]. Shared by `text_winnow_fp` and `dedup_winnow_pairs`
    * so the fingerprint definition cannot drift between the profile
    * and the pair join. Caller must pre-filter size(tokens) >= k+w-1
    * (Spark's sequence(1, n) flips descending for n < 1). */
  def winnowHashesExpr(k: Int): String =
    // the native allocation-free kernel; BIT-IDENTICAL values to the
    // former `transform(sequence(1, size(tokens) - (k-1)), i ->
    // graft_str_fp(concat_ws(' ', slice(tokens, i, k))))` HOF incl.
    // concat_ws null-skipping (TextSketchSpec equates them), so every
    // winnow-family oracle hash is unchanged — measured 6.5 s → <1 s
    // on the sf0.1 APSS posting build
    s"graft_shingle_fps(tokens, $k)"

  /** Per-window argmin selection over a `hashes` column: for each of
    * the size-w windows, the RIGHTMOST position holding the window
    * minimum; distinct positions = the winnowing fingerprint set.
    * Each window's minimum is materialized ONCE (zip_with pairs the
    * window index with its min) instead of re-evaluating
    * array_min(slice) inside the position filter — O(n·w), not
    * O(n·w²); the oracle's naive form pins the semantics. */
  def winnowSelsExpr(w: Int): String = {
    val idx = s"sequence(1, size(hashes) - ${w - 1})"
    s"array_distinct(zip_with($idx, " +
      s"transform($idx, j -> array_min(slice(hashes, j, $w))), " +
      s"(j, m) -> array_max(filter(sequence(j, j + ${w - 1}), " +
      s"i -> element_at(hashes, i) = m))))"
  }

  /** DuckDB twins (list-HOF forms of the same two kernels). */
  def duckWinnowHashes(k: Int): String =
    s"list_transform(generate_series(1, len(tokens) - ${k - 1}), " +
      s"i -> ${duckFp(s"array_to_string(tokens[i:i+${k - 1}], ' ')")})"

  def duckWinnowSels(w: Int): String =
    s"list_distinct(list_transform(generate_series(1, len(hashes) - ${w - 1}), " +
      s"j -> list_max(list_filter(generate_series(j, j + ${w - 1}), " +
      s"i2 -> hashes[i2] = list_min(hashes[j:j+${w - 1}])))))"

  /** Pinned-golden digest rider for the rows-only entries (VERDICT r8
    * #2): the five queries here whose semantics no SQL oracle can
    * express (chunker / summarizer / matcher logic) get an
    * order-independent digest of their OWN full output —
    * `sum(pmod(xxhash64(every column), 10^9+7))` — attached to every
    * row via a 1-row broadcast cross join, plus `golden_ok` = digest ==
    * the pinned constant for this scale factor. The driver's rows-only
    * check can't see value drift; the digest column makes any semantic
    * drift visible in the dumped parquet round-over-round, and
    * `golden_ok=false` flags it loudly. pmod keeps the running sum far
    * from Long overflow (ANSI mode would throw); the sum is one
    * partial-aggregated pass — no single-partition collect, scales like
    * any global count.
    *
    * Constants were derived by running `graft.Verify` at each sf and
    * reading the digest back (round 9); the underlying semantics are
    * pinned by ChunkerSpec / HierarchySpec / SubjectMatcherSpec — a
    * digest change means one of those suites' subjects drifted. Unknown
    * sf dirs (e.g. the ×8 scale harness) get golden_ok = NULL rather
    * than false.
    *
    * The gate is FATAL (VERDICT r9 #1): when a pinned constant exists
    * for the sf and the computed digest differs, every output row
    * raises — so the driver's Verify run records the query as `err`
    * instead of quietly carrying `golden_ok=false` in a column nobody
    * reads. GoldenGateSpec proves the trip end-to-end with a perturbed
    * corpus twin. */
  private[queries] def withGoldenDigest(df: DataFrame, d: String, queryName: String): DataFrame =
    withGoldenDigestExpected(df,
      GoldenDigests.get(queryName).flatMap(_.get(new java.io.File(d).getName)), queryName)

  /** Testable core of the golden gate: `expected = Some(e)` pins the
    * digest fatally, `None` (unknown sf) degrades to `golden_ok = NULL`. */
  private[graft] def withGoldenDigestExpected(
      df: DataFrame, expected: Option[Long], queryName: String): DataFrame = {
    val hashAll = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(1000000007L))
    val digest = df.agg(sum(hashAll).as("golden_digest"))
    df.crossJoin(broadcast(digest))
      .withColumn("golden_ok",
        expected.map(e =>
          when(col("golden_digest") === lit(e), lit(true))
            .otherwise(raise_error(concat(
              lit(s"golden digest drift in $queryName: expected $e, got "),
              col("golden_digest").cast("string")))))
          .getOrElse(lit(null).cast("boolean")))
  }

  private val GoldenDigests: Map[String, Map[String, Long]] = Map(
    "subject_match_topk" -> Map(
      "sf0.001" -> 254965504157L,
      "sf0.01" -> 272207590044L,
      "sf0.1" -> 2525470469629L),
    "chunk_paragraph" -> Map(
      "sf0.001" -> 561264543966L,
      "sf0.01" -> 525465140515L,
      "sf0.1" -> 5280611936760L),
    "chunk_hierarchical" -> Map(
      "sf0.001" -> 1343592040504L,
      "sf0.01" -> 1332586306763L,
      "sf0.1" -> 13146286255045L),
    "text_summarize" -> Map(
      "sf0.001" -> 250508629023L,
      "sf0.01" -> 250508629023L, // sf0.001/sf0.01 share doc_ids 0-499 and
      // every doc summarizes to 1 sentence — equal digests are genuine
      "sf0.1" -> 2492689638523L),
    "mm_pixel_stats_jpeg" -> Map(
      "sf0.001" -> 257023099803L,
      "sf0.01" -> 257023099803L, // sf0.001/sf0.01 share doc_ids 0-499;
      // the image formula depends only on doc_id — equal digests genuine
      "sf0.1" -> 2515954677239L),
    "mm_mp4_frames" -> Map(
      "sf0.001" -> 241078487508L,
      "sf0.01" -> 241078487508L, // doc_id-only formula, shared ids — see above
      "sf0.1" -> 2491278782749L),
    "sim_semantic_match" -> Map(
      "sf0.001" -> 5081089278L,
      "sf0.01" -> 7166123759L,
      "sf0.1" -> 12372869121L),
    // the composed silver→gold lifecycle (SinkQueries) — state is
    // sf-keyed, so the digest pins the full normalize→dedup→CDC→merge→
    // chunk→star chain per scale factor
    "e2e_silver_gold" -> Map(
      "sf0.001" -> 9655746538L,
      "sf0.01" -> 9211674417L,
      "sf0.1" -> 9491981771L),
    // the PDF-bytes silver composition (SinkQueries.e2eSilverPdf):
    // 3 census rows per sf — tier 1/2/3 counts + token/order sums —
    // derived r17 via the same Verify read-back procedure
    "e2e_silver_pdf" -> Map(
      "sf0.001" -> 2027965189L,
      "sf0.01" -> 2048822739L,
      "sf0.1" -> 1446433872L))
}
