package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** Fuzzy/guaranteed-recall dedup tier — split from DedupQueries in r12
  * (mechanical move, registry names and oracles unchanged): the
  * SymSpell deletion-neighborhood word join and the winnowing pair
  * join with its substring-recall guarantee.
  */
private[queries] object FuzzyDedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** SymSpell-style FUZZY word join (Garbe's symmetric-delete spelling
    * correction, the scale-correct way to find edit-distance-1 pairs
    * without an all-pairs scan): every word expands to itself + its
    * single-DELETION variants; two words within Levenshtein 1 of each
    * other always share a variant (substitution → delete the differing
    * position from both; indel → the shorter IS a deletion of the
    * longer), so candidates come from an EQUI-join on the variant —
    * O(Σ len) expansion rows and a hash shuffle keyed by variant,
    * never |vocab|² — and an exact `levenshtein` residual drops the
    * near-miss candidates the delete-neighborhood admits (e.g.
    * transpositions at Damerau 1 / Levenshtein 2). The DuckDB oracle
    * is the honest brute force: cross-join the vocab with
    * `levenshtein(a, b) = 1` — completeness of the neighborhood is
    * itself under the hash (a missed pair breaks fp_sum). Vocab is a
    * doc subset (%50) so the oracle's quadratic side stays sf0.01-
    * sized; the Spark side's banded shape is the one that scales. */
  private val dedupSymspellJoin: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .filter(col("doc_id") % 50 === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 4)
      .distinct()
    val variants = words.select(col("w"), explode(concat(
        array(col("w")),
        expr("transform(sequence(1, length(w)), " +
          "i -> concat(substring(w, 1, i - 1), substring(w, i + 1, length(w) - i)))")
      )).as("v"))
      .distinct() // "aab" yields "ab" twice — dedup so no pair double-counts
    val cands = variants.as("l").join(variants.as("r"), col("l.v") === col("r.v"))
      .filter(col("l.w") < col("r.w"))
      .select(col("l.w").as("w1"), col("r.w").as("w2"))
      .distinct()
    cands.filter(levenshtein(col("w1"), col("w2")) === 1)
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(expr("graft_str_fp(concat(w1, '|', w2))")), lit(0L)).as("fp_sum"),
        coalesce(sum(length(col("w1")) + length(col("w2"))), lit(0L))
          .cast("long").as("len_sum"))
  }

  /** WINNOWING near-dup PAIRS — the fingerprint family's third member
    * (MinHash: probabilistic Jaccard recall; SimHash: Hamming-ball
    * recall; winnowing: a GUARANTEE — any pair sharing a substring of
    * ≥ w+k−1 tokens shares a selected fingerprint, Schleimer et al.
    * 2003 §3). Fixture injects shifted near-dups (docs %20 re-appear
    * with their first token dropped): a shift breaks every MinHash
    * band with probability ~1 per permutation decorrelation but leaves
    * all interior k-gram windows INTACT, so winnowing catches each
    * pair by construction. Pipeline: per-doc winnowed (hash) set
    * (positions dropped — matching is by content, not offset), explode,
    * hash-keyed self-join (the same banded equi-join shape as every
    * LSH pipeline — candidate volume bounded by per-print bucket
    * sizes, never |corpus|²), pair-count ≥ 2 prints. Output pins the
    * pair census: total pairs, how many are the injected truth
    * (d1 = d0+100000), and the shared-print mass. */
  private val dedupWinnowPairs: Q = (s, d) => {
    val K = 3; val W = 4; val T = 2
    val base = Tables.documents(s, d).select("doc_id", "text")
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 20 === 0).select(
        (col("doc_id") + 100000).as("doc_id"),
        expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))")
          .as("text")))
    val fps = corpus
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= K + W - 1)
      .withColumn("hashes", expr(winnowHashesExpr(K)))
      .withColumn("sels", expr(winnowSelsExpr(W)))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sels, p -> element_at(hashes, p)))")).as("h"))
    fps.as("l").join(fps.as("r"), col("l.h") === col("r.h"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("d0"), col("r.doc_id").as("d1"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= T)
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("d1") === col("d0") + 100000, 1L).otherwise(0L)), lit(0L))
          .as("n_true"),
        coalesce(sum("shared"), lit(0L)).as("shared_sum"))
  }

  val queries: Seq[(String, Q)] = Seq(
    "dedup_symspell_join" -> dedupSymspellJoin,
    "dedup_winnow_pairs" -> dedupWinnowPairs,
  )

  val oracles: Map[String, String] = Map(
    "dedup_winnow_pairs" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id,
         |    array_to_string(string_split(text, ' ')[2:], ' ') AS text
         |  FROM documents WHERE doc_id % 20 = 0),
         |t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tokens FROM base),
         |g AS (
         |  SELECT doc_id, ${duckWinnowHashes(3)} AS hashes
         |  FROM t WHERE len(tokens) >= 6),
         |f AS (
         |  SELECT doc_id, hashes, ${duckWinnowSels(4)} AS sels
         |  FROM g),
         |fp AS (
         |  SELECT DISTINCT doc_id, u.h
         |  FROM f, UNNEST(list_transform(sels, p -> hashes[p])) u(h)),
         |pairs AS (
         |  SELECT l.doc_id AS d0, r.doc_id AS d1, count(*) AS shared
         |  FROM fp l JOIN fp r ON l.h = r.h AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(sum(CASE WHEN d1 = d0 + 100000 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_true,
         |  CAST(coalesce(sum(shared), 0) AS BIGINT) AS shared_sum
         |FROM pairs""".stripMargin,
    "dedup_symspell_join" ->
      // honest brute force: quadratic levenshtein over the vocab — the
      // delete-neighborhood join must reproduce it exactly
      s"""WITH w AS (
         |  SELECT DISTINCT u.w FROM documents,
         |    UNNEST(string_split(text, ' ')) u(w)
         |  WHERE doc_id % 50 = 0 AND len(u.w) >= 4),
         |p AS (
         |  SELECT a.w AS w1, b.w AS w2 FROM w a JOIN w b ON a.w < b.w
         |  WHERE levenshtein(a.w, b.w) = 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(sum(${duckFp("w1 || '|' || w2")}), 0) AS BIGINT)
         |    AS fp_sum,
         |  CAST(coalesce(sum(len(w1) + len(w2)), 0) AS BIGINT) AS len_sum
         |FROM p""".stripMargin,
  )
}
