package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Higher-order LM scoring tier (r13) — completes the CCNet-style
  * perplexity-filter family above TextCurationQueries' unigram/bigram
  * entries (Wenzek et al. 2020 filter CommonCrawl with a 5-gram KenLM;
  * these are the relational mechanics at order 3 and with Kneser-Ney
  * smoothing, the smoothing KenLM actually uses).
  *
  * Shared determinism discipline (same as the 1/2-gram entries): all
  * counts are exact integers from corpus aggregates; each token's
  * probability is combined in ONE fixed IEEE expression order; ln
  * collapses to an e6 fixed-point INTEGER per token BEFORE the per-doc
  * sum, so aggregation order can never move the cross-engine hash.
  *
  * Scale shape (both queries): explode → n-gram count aggregates
  * (partial/final map-side combine), then equi-joins of the exploded
  * corpus against its own count tables — at 100 TB each join is one
  * hash shuffle keyed by the n-gram; the count tables are the big dims
  * and co-partition with the occurrence side. No windows, no driver
  * state.
  */
private[queries] object LmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exploded positions with 1- and 2-back context, shared by both
    * queries. posexplode is 0-based; element_at is 1-based, so
    * element_at(t, pos) is the PREVIOUS token. */
  private def positions(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr("doc_id", "posexplode(t) AS (pos, tok)", "t")
      .selectExpr("doc_id", "pos", "tok",
        "CASE WHEN pos = 0 THEN NULL ELSE element_at(t, pos) END AS prev",
        "CASE WHEN pos <= 1 THEN NULL ELSE element_at(t, pos - 1) END AS prev2")

  /** Interpolated TRIGRAM log-prob — order 3 of the Jelinek-Mercer
    * ladder: token i ≥ 3 scores p = 0.6·P(wᵢ|wᵢ₋₂wᵢ₋₁) + 0.3·P(wᵢ|wᵢ₋₁)
    * + 0.1·P(wᵢ), the second token the bigram mix, the first its
    * unigram. The model is corpus-derived, so every n-gram being scored
    * exists in its count table (count ≥ 1 from this very occurrence) —
    * the left joins only pass NULL through the short-context branches.
    * Context denominators: P(w|uv) = c(uvw)/c(uv) with c(uv) from the
    * bigram table (always present — the pair occurs at positions
    * i−2,i−1 of this document). */
  private val textTrigramLogprob: Q = (s, d) => {
    val pos = positions(s, d)
    val uni = pos.groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum("cu").as("nt"))
    val bi = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("cb"))
    val tri = pos.filter(col("prev2").isNotNull)
      .groupBy("prev2", "prev", "tok").agg(count(lit(1)).as("ct"))
    pos
      .join(uni, "tok")
      .join(uni.select(col("tok").as("prev"), col("cu").as("cp")), Seq("prev"), "left")
      .join(bi, Seq("prev", "tok"), "left")
      .join(bi.select(col("prev").as("prev2"), col("tok").as("prev"),
        col("cb").as("cbp")), Seq("prev2", "prev"), "left")
      .join(tri, Seq("prev2", "prev", "tok"), "left")
      .crossJoin(broadcast(tot))
      .selectExpr("doc_id",
        "CAST(floor(ln(CASE WHEN prev IS NULL THEN CAST(cu AS DOUBLE) / nt " +
          "WHEN prev2 IS NULL THEN 0.7D * (CAST(cb AS DOUBLE) / cp) " +
          "+ 0.3D * (CAST(cu AS DOUBLE) / nt) " +
          "ELSE 0.6D * (CAST(ct AS DOUBLE) / cbp) " +
          "+ 0.3D * (CAST(cb AS DOUBLE) / cp) " +
          "+ 0.1D * (CAST(cu AS DOUBLE) / nt) END) " +
          "* 1000000) AS BIGINT) AS lp_e6")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp_e6").as("sum_lp_e6"))
      .selectExpr("doc_id", "n_tokens",
        "CAST(floor(CAST(-sum_lp_e6 AS DOUBLE) / n_tokens / 100.0D) AS BIGINT) AS nll_e4")
      .orderBy("doc_id")
  }

  /** Interpolated KNESER-NEY bigram log-prob — the smoothing real LM
    * filters use (Kneser & Ney 1995; KenLM's default). Absolute
    * discounting with D = 0.75 moves mass from seen bigrams to a
    * CONTINUATION distribution (how many distinct contexts a word
    * follows — "Francisco" is frequent but follows only "San", so its
    * continuation probability is tiny):
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + D·N₁₊(v·)/c(v) · N₁₊(·w)/N₁₊(··)
    *
    * All inputs are integer counts and D = 3/4, so the probability is
    * the exact rational [max(100·c(vw)−75, 0)·N₁₊(··) + 75·N₁₊(v·)·N₁₊(·w)]
    * / [100·c(v)·N₁₊(··)] — numerator and denominator are computed in
    * BIGINT (one e2 grid absorbs the discount) and meet the double
    * world only in the final division, so both engines ln() the
    * IDENTICAL double. c(v) = Σ_w c(vw) (true context mass, not the
    * unigram count — the distinction matters at document ends). First
    * tokens score their unigram MLE. */
  /** Per-doc KN scores (doc_id, n_tokens, nll_e4), shared by the
    * scoring entry and the percentile bucketing entry — memoized +
    * checkpointed (r20): a CCNet-style pipeline scores the corpus once
    * and persists the per-doc perplexities; the bucketing entry reads
    * that table instead of re-training the counts chain. */
  private def knPerDoc(s: SparkSession, d: String): DataFrame =
    graft.queries.PipelineShared.memo(s, s"kn_perdoc|$d")(
      knPerDocBuild(s, d).localCheckpoint())

  private def knPerDocBuild(s: SparkSession, d: String): DataFrame = {
    val pos = positions(s, d).drop("prev2")
    val uni = pos.groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum("cu").as("nt"))
    val bi = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("cb"))
    val ctx = bi.groupBy("prev").agg(sum("cb").as("cv"), count(lit(1)).as("n1v"))
    val cont = bi.groupBy("tok").agg(count(lit(1)).as("n1w"))
    val n1tot = bi.agg(count(lit(1)).as("n1tot"))
    pos
      .join(uni, "tok")
      .join(bi, Seq("prev", "tok"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(cont, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(n1tot))
      .selectExpr("doc_id",
        "CAST(floor(ln(CASE WHEN prev IS NULL THEN CAST(cu AS DOUBLE) / nt " +
          "ELSE CAST(greatest(100 * cb - 75, 0) * n1tot + 75 * n1v * n1w AS DOUBLE) " +
          "/ CAST(100 * cv * n1tot AS DOUBLE) END) " +
          "* 1000000) AS BIGINT) AS lp_e6")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp_e6").as("sum_lp_e6"))
      .selectExpr("doc_id", "n_tokens",
        "CAST(floor(CAST(-sum_lp_e6 AS DOUBLE) / n_tokens / 100.0D) AS BIGINT) AS nll_e4")
  }

  private val textKnLogprob: Q = (s, d) => knPerDoc(s, d).orderBy("doc_id")

  /** CCNet perplexity BUCKETING — what Wenzek et al. actually ship:
    * each language/source split into head/middle/tail THIRDS by LM
    * perplexity (head = most fluent third, what pretraining keeps or
    * up-weights; tail = the gibberish end). Relationally: the KN
    * per-doc scores, percentile-split WITHIN each source by
    * ntile(3) over the total order (nll_e4, doc_id) — the window
    * partitions on source, so rank work is per-source and scale-safe,
    * no global sort (same discipline as `text_quality_calibrate`).
    * Output: per (source, bucket) doc/token counts and the NLL range
    * the bucket spans — the mass table a mixture planner consumes. */
  private val textPplBuckets: Q = (s, d) => {
    val scored = knPerDoc(s, d)
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("nll_e4"), col("doc_id"))
    scored.withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        min("nll_e4").as("nll_min_e4"),
        max("nll_e4").as("nll_max_e4"))
      .orderBy("source", "bucket")
  }

  /** ZIPF / HEAPS corpus-naturalness census — the sanity gate before
    * any frequency-derived model (LM counts, BPE merges, OOV cutoffs)
    * is trusted: natural language has freq(rank)·rank ≈ const (Zipf);
    * machine-generated or template-spam corpora visibly violate it.
    * Output: the top-64 vocabulary with rank, count, and the Zipf
    * ratio cnt·rank/cnt₁ in e4 fixed point (exact integer division),
    * plus the global type/token counts (the Heaps-law pair). Rank is
    * computed as 1 + |strictly better| via a broadcast self-join over
    * the 64-row head — the RRF-rank pattern, no global window; the
    * top-64 itself is a distributed heap top-k, and the vocab count
    * is one partial/final aggregate. */
  private val textZipfCensus: Q = (s, d) => {
    val vocab = Tables.documents(s, d)
      .selectExpr("explode(split(text, ' ')) AS tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"))
    val top = vocab.orderBy(col("cnt").desc, col("tok").asc).limit(64)
    val rhs = top.select(col("cnt").as("b_cnt"), col("tok").as("b_tok"))
    val ranked = top.join(broadcast(rhs),
        col("b_cnt") > col("cnt") ||
          (col("b_cnt") === col("cnt") && col("b_tok") < col("tok")), "left")
      .groupBy("tok", "cnt").agg((count(col("b_tok")) + lit(1L)).as("rank"))
    val head = ranked.filter(col("rank") === 1).select(col("cnt").as("top_cnt"))
    ranked.crossJoin(broadcast(head)).crossJoin(broadcast(totals))
      .selectExpr("rank", "tok", "cnt",
        "(cnt * rank * 10000) DIV top_cnt AS zipf_ratio_e4",
        "n_types", "n_tokens")
      .orderBy("rank")
  }

  /** TRAINED Naive-Bayes quality classifier — the LEARNED complement to
    * the rule-based quality tier: GPT-3/CCNet-style pipelines train a
    * lightweight classifier (fastText in practice) to separate a
    * high-quality slice from the crawl and score every document; the
    * multinomial-NB reduction keeps it fully relational — two count
    * aggregates ARE the training pass. Deterministic fixture: label =
    * source-id parity (the wiki-vs-crawl stand-in), train on doc_id %5≠0,
    * add-one smoothing over the train vocab. Integer discipline (the LM
    * tier's): each word's log-weight lw = ⌊ln P(w|1)·e6⌋ − ⌊ln P(w|0)·e6⌋
    * collapses PER TYPE before the per-doc weighted sum, OOV words take
    * the smoothed-zero weight, the class prior joins as one e6 integer —
    * so every margin is an exact BIGINT and the confusion census (doc
    * counts + margin mass per truth/predicted cell) is hash-stable.
    *
    * Scale: two partial/final count aggregates over the train split;
    * the weight table IS the model — a word-keyed dim the holdout join
    * hash-partitions against; scoring = one equi-join + per-doc sum.
    * No windows, no driver state beyond two 1-row broadcasts. */
  private val textNbClassifier: Q = (s, d) => {
    val docs = Tables.documents(s, d).selectExpr(
      "doc_id", "split(text, ' ') AS tokens",
      "CAST(substring(source, 4) AS INT) % 2 AS label")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val hold = docs.filter(col("doc_id") % 5 === 0)
    val cwy = train.select(col("label"), explode(col("tokens")).as("w"))
      .groupBy("w").agg(
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("c0"))
      .localCheckpoint() // feeds both the totals and the weight table
    val scal = cwy.agg(sum("c1").as("t1"), sum("c0").as("t0"),
        count(lit(1)).as("v"))
      .crossJoin(train.agg(
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("n0")))
      .selectExpr("t1", "t0", "v",
        "CAST(floor(ln(1 / CAST(t1 + v AS DOUBLE)) * 1000000) AS BIGINT) - " +
          "CAST(floor(ln(1 / CAST(t0 + v AS DOUBLE)) * 1000000) AS BIGINT) AS oov_lw",
        "CAST(floor(ln(CAST(n1 AS DOUBLE) / n0) * 1000000) AS BIGINT) AS prior_e6")
      .localCheckpoint() // 1 row
    val weights = cwy.crossJoin(broadcast(scal.select("t1", "t0", "v")))
      .selectExpr("w",
        "CAST(floor(ln((c1 + 1) / CAST(t1 + v AS DOUBLE)) * 1000000) AS BIGINT) - " +
          "CAST(floor(ln((c0 + 1) / CAST(t0 + v AS DOUBLE)) * 1000000) AS BIGINT) AS lw")
    hold.select(col("doc_id"), col("label"), explode(col("tokens")).as("w"))
      .groupBy("doc_id", "label", "w").agg(count(lit(1)).as("n"))
      .join(weights, Seq("w"), "left")
      .crossJoin(broadcast(scal.select("oov_lw")))
      .selectExpr("doc_id", "label", "n * coalesce(lw, oov_lw) AS contrib")
      .groupBy("doc_id", "label").agg(sum("contrib").as("sw"))
      .crossJoin(broadcast(scal.select("prior_e6")))
      .selectExpr("label AS true_label",
        "CASE WHEN sw + prior_e6 >= 0 THEN 1 ELSE 0 END AS predicted",
        "sw + prior_e6 AS margin_e6")
      .groupBy("true_label", "predicted")
      .agg(count(lit(1)).as("n_docs"), sum("margin_e6").as("margin_sum_e6"))
      .orderBy("true_label", "predicted")
  }

  val queries: Seq[(String, Q)] = Seq(
    "text_trigram_logprob" -> textTrigramLogprob,
    "text_kn_logprob" -> textKnLogprob,
    "text_ppl_buckets" -> textPplBuckets,
    "text_zipf_census" -> textZipfCensus,
    "text_nb_classifier" -> textNbClassifier,
  )

  val oracles: Map[String, String] = Map(
    "text_nb_classifier" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS tokens,
        |    CAST(substring(source, 4) AS INT) % 2 AS label
        |  FROM documents),
        |train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
        |hold AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
        |cwy AS (
        |  SELECT u.w,
        |    sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
        |  FROM train, UNNEST(tokens) u(w) GROUP BY u.w),
        |tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM cwy),
        |pri AS (SELECT sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
        |               sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0
        |        FROM train),
        |scal AS (SELECT
        |    CAST(floor(ln(1 / CAST(t1 + v AS DOUBLE)) * 1000000) AS BIGINT)
        |    - CAST(floor(ln(1 / CAST(t0 + v AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS oov_lw,
        |    CAST(floor(ln(CAST(n1 AS DOUBLE) / n0) * 1000000) AS BIGINT)
        |      AS prior_e6
        |  FROM tot, pri),
        |wts AS (
        |  SELECT w,
        |    CAST(floor(ln((c1 + 1) / CAST(t1 + v AS DOUBLE)) * 1000000) AS BIGINT)
        |    - CAST(floor(ln((c0 + 1) / CAST(t0 + v AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS lw
        |  FROM cwy, tot),
        |hw AS (
        |  SELECT doc_id, label, u.w, count(*) AS n
        |  FROM hold, UNNEST(tokens) u(w) GROUP BY doc_id, label, u.w),
        |m AS (
        |  SELECT h.doc_id, h.label,
        |    sum(h.n * coalesce(t.lw, (SELECT oov_lw FROM scal)))
        |      + (SELECT prior_e6 FROM scal) AS margin_e6
        |  FROM hw h LEFT JOIN wts t ON h.w = t.w
        |  GROUP BY h.doc_id, h.label)
        |SELECT CAST(label AS INT) AS true_label,
        |  CAST(CASE WHEN margin_e6 >= 0 THEN 1 ELSE 0 END AS INT) AS predicted,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(margin_e6) AS BIGINT) AS margin_sum_e6
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_trigram_logprob" ->
      // unrolled-CTE twin in the identical IEEE expression order; every
      // scored n-gram exists in its count table (corpus-derived model)
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        |  SELECT doc_id, ii.i AS pos, t[ii.i] AS tok,
        |    CASE WHEN ii.i = 1 THEN NULL ELSE t[ii.i - 1] END AS prev,
        |    CASE WHEN ii.i <= 2 THEN NULL ELSE t[ii.i - 2] END AS prev2
        |  FROM toks, UNNEST(generate_series(1, len(t))) ii(i)),
        |uni AS (SELECT tok, count(*) AS cu FROM pos GROUP BY tok),
        |tot AS (SELECT sum(cu) AS nt FROM uni),
        |bi AS (
        |  SELECT prev, tok, count(*) AS cb FROM pos
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tri AS (
        |  SELECT prev2, prev, tok, count(*) AS ct FROM pos
        |  WHERE prev2 IS NOT NULL GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT p.doc_id,
        |    CAST(floor(ln(CASE WHEN p.prev IS NULL THEN CAST(u.cu AS DOUBLE) / t.nt
        |      WHEN p.prev2 IS NULL THEN 0.7 * (CAST(b.cb AS DOUBLE) / up.cu)
        |        + 0.3 * (CAST(u.cu AS DOUBLE) / t.nt)
        |      ELSE 0.6 * (CAST(tr.ct AS DOUBLE) / bp.cb)
        |        + 0.3 * (CAST(b.cb AS DOUBLE) / up.cu)
        |        + 0.1 * (CAST(u.cu AS DOUBLE) / t.nt) END) * 1000000) AS BIGINT) AS lp_e6
        |  FROM pos p
        |  JOIN uni u ON u.tok = p.tok
        |  LEFT JOIN uni up ON up.tok = p.prev
        |  LEFT JOIN bi b ON b.prev = p.prev AND b.tok = p.tok
        |  LEFT JOIN bi bp ON bp.prev = p.prev2 AND bp.tok = p.prev
        |  LEFT JOIN tri tr ON tr.prev2 = p.prev2 AND tr.prev = p.prev AND tr.tok = p.tok
        |  CROSS JOIN tot t),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    sum(lp_e6) AS sum_lp_e6
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(CAST(-sum_lp_e6 AS DOUBLE) / n_tokens / 100.0) AS BIGINT) AS nll_e4
        |FROM per_doc ORDER BY doc_id""".stripMargin,
    "text_zipf_census" ->
      // row_number over the unique (cnt desc, tok) total order equals
      // the engine's 1 + |strictly better| broadcast-join rank
      """WITH vocab AS (
        |  SELECT u.tok, count(*) AS cnt FROM documents,
        |    UNNEST(string_split(text, ' ')) u(tok) GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens FROM vocab),
        |top AS (SELECT tok, cnt FROM vocab ORDER BY cnt DESC, tok ASC LIMIT 64),
        |ranked AS (
        |  SELECT tok, CAST(cnt AS BIGINT) AS cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank
        |  FROM top),
        |hd AS (SELECT cnt AS top_cnt FROM ranked WHERE rank = 1)
        |SELECT rank, tok, cnt,
        |  CAST((cnt * rank * 10000) // top_cnt AS BIGINT) AS zipf_ratio_e4,
        |  n_types, n_tokens
        |FROM ranked, hd, tot ORDER BY rank""".stripMargin,
    "text_kn_logprob" ->
      // the KN rational is assembled in BIGINT on both sides; the only
      // double op before ln is the single final division
      s"""WITH $duckKnPerDoc
         |SELECT doc_id, n_tokens, nll_e4
         |FROM kn ORDER BY doc_id""".stripMargin,
    "text_ppl_buckets" ->
      s"""WITH $duckKnPerDoc,
         |ranked AS (
         |  SELECT k.doc_id, k.n_tokens, k.nll_e4, dd.source,
         |    CAST(ntile(3) OVER (PARTITION BY dd.source
         |      ORDER BY k.nll_e4, k.doc_id) AS BIGINT) AS bucket
         |  FROM kn k JOIN documents dd ON dd.doc_id = k.doc_id)
         |SELECT source, bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(min(nll_e4) AS BIGINT) AS nll_min_e4,
         |  CAST(max(nll_e4) AS BIGINT) AS nll_max_e4
         |FROM ranked GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,
  )

  /** KN per-doc scoring CTE chain ending in `kn(doc_id, n_tokens,
    * nll_e4)` — the SQL twin of [[knPerDoc]], shared by both oracles. */
  private def duckKnPerDoc: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, ii.i AS pos, t[ii.i] AS tok,
      |    CASE WHEN ii.i = 1 THEN NULL ELSE t[ii.i - 1] END AS prev
      |  FROM toks, UNNEST(generate_series(1, len(t))) ii(i)),
      |uni AS (SELECT tok, count(*) AS cu FROM pos GROUP BY tok),
      |tot AS (SELECT sum(cu) AS nt FROM uni),
      |bi AS (
      |  SELECT prev, tok, count(*) AS cb FROM pos
      |  WHERE prev IS NOT NULL GROUP BY 1, 2),
      |ctx AS (SELECT prev, sum(cb) AS cv, count(*) AS n1v FROM bi GROUP BY prev),
      |cont AS (SELECT tok, count(*) AS n1w FROM bi GROUP BY tok),
      |n1t AS (SELECT count(*) AS n1tot FROM bi),
      |scored AS (
      |  SELECT p.doc_id,
      |    CAST(floor(ln(CASE WHEN p.prev IS NULL THEN CAST(u.cu AS DOUBLE) / t.nt
      |      ELSE CAST(greatest(100 * b.cb - 75, 0) * n.n1tot
      |          + 75 * cx.n1v * co.n1w AS DOUBLE)
      |        / CAST(100 * cx.cv * n.n1tot AS DOUBLE) END) * 1000000) AS BIGINT) AS lp_e6
      |  FROM pos p
      |  JOIN uni u ON u.tok = p.tok
      |  LEFT JOIN bi b ON b.prev = p.prev AND b.tok = p.tok
      |  LEFT JOIN ctx cx ON cx.prev = p.prev
      |  LEFT JOIN cont co ON co.tok = p.tok
      |  CROSS JOIN tot t CROSS JOIN n1t n),
      |kn AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(floor(CAST(-sum(lp_e6) AS DOUBLE) / count(*) / 100.0) AS BIGINT) AS nll_e4
      |  FROM scored GROUP BY doc_id)""".stripMargin
}
