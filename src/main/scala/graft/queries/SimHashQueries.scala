package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** SimHash (Hamming-space) dedup tier — split from DedupQueries in r12
  * (mechanical move, registry names and oracles unchanged): 8-bit
  * signature projection, the 32-bit bit-sampling pair pipeline, the
  * Hamming<=1 multiprobe variant with its pigeonhole recall guarantee,
  * and the pair-recall audit. See DedupQueries for the Jaccard-space
  * (MinHash/shingle) side of the family.
  */
private[graft] object SimHashQueries {

  /** SimHash (8-bit): per-word fingerprints hashed per bit-plane; bit b
    * set iff the +1/-1 vote sum is positive. Output doc_id → signature. */
  private val dedupSimhash: Q = (s, d) => {
    // all 8 bit-plane vote folds in one fused pass (graft_simhash ==
    // the per-bit aggregate() folds bitwise, TextSketchSpec); cast back
    // to INT to keep the r3-pinned oracle schema
    Tables.documents(s, d)
      .selectExpr("doc_id", "split(text, ' ') AS tokens")
      .selectExpr("doc_id",
        "CAST(graft_simhash(graft_word_fps(tokens), 8) AS INT) AS simhash8")
      .orderBy("doc_id")
  }

  /** SimHash near-dup PAIRS — the Hamming-space complement of the
    * MinHash pair pipeline: 32-bit signatures, bucketed by their two
    * 16-bit halves (a pair within Hamming ≤ 3 whose differing bits all
    * land in ONE half shares the other half verbatim — standard
    * bit-sampling LSH, recall < 1 by design exactly like
    * `dedup_minhash_lsh`, and BOTH engines derive candidates the same
    * way so the hash compare pins the semantics), then confirmed by
    * popcount of the signature XOR. The candidate join moves only
    * (16-bit bucket, doc_id) pairs; the confirm is two integer ops per
    * candidate — no token data is ever re-read. Signature width is the
    * scale lever (same law as LshBands' bandBits): bucket occupancy is
    * E[N/2^halfBits], so a bigger corpus wants wider halves — 16-bit
    * halves suit ~10^6 docs; this corpus's shared 30-word vocabulary
    * makes it the adversarial clustered case (an 8-bit-half variant
    * measured 8k confirmed pairs on 535 docs — the quadratic regime
    * the width guard exists to prevent). */
  /** 32-bit signatures over the near-dup fixture (documents + first-
    * token-dropped copies of doc_id%20==0) — shared by the pair
    * pipeline and its recall audit. */
  private def simhash32Sigs(s: SparkSession, d: String): DataFrame =
    // memoized CHECKPOINTED build (r20): the signature table is the
    // PERSISTED artifact of this tier (4 bytes/doc — the thing a
    // production pipeline stores and maintains incrementally); the
    // pair / multiprobe / recall entries share one tokenize+fold pass,
    // and each plan's 3-5 references to `sigs` read the materialized
    // 2-column frame instead of re-running the word-fp folds per leg
    PipelineShared.memo(s, s"simhash32_sigs|$d") {
      val docs = Tables.documents(s, d)
        .selectExpr("doc_id", "split(text, ' ') AS tokens")
      val dups = docs.filter(col("doc_id") % 20 === 0)
        .selectExpr("doc_id + 100000 AS doc_id", "slice(tokens, 2, size(tokens) - 1) AS tokens")
      docs.union(dups).filter(size(col("tokens")) >= 3)
        .selectExpr("doc_id", "graft_simhash(graft_word_fps(tokens), 32) AS sig")
        .localCheckpoint()
    }

  /** The bit-sampling candidate join + popcount confirm over 32-bit
    * signatures — the found-pair half shared by `dedup_simhash_pairs`
    * and `dedup_simhash_recall`. */
  private def simhashFoundPairs(sigs: DataFrame): DataFrame = {
    val bands = sigs.selectExpr("doc_id",
      "posexplode(array(sig DIV 65536, sig % 65536)) AS (band_idx, band_val)")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .selectExpr("id_a", "id_b", "CAST(bit_count(sig_a ^ sig_b) AS BIGINT) AS hamming")
      .filter(col("hamming") <= 3)
  }

  private val dedupSimhashPairs: Q = (s, d) =>
    simhashFoundPairs(simhash32Sigs(s, d)).orderBy("id_a", "id_b")

  /** Multi-probe bit-sampling pairs — the GUARANTEED-recall variant of
    * [[simhashFoundPairs]]: one join side keeps its exact 16-bit half
    * values, the other probes every Hamming ≤ 1 neighbor of each half
    * (17 probes: the value itself + 16 single-bit flips). Pigeonhole
    * over a Hamming ≤ 3 pair's 32 bits: the two halves cannot BOTH
    * carry ≥ 2 differing bits, so the half with ≤ 1 flips to an exact
    * match under some probe — every true pair becomes a candidate, and
    * after the popcount ≤ 3 confirm the output IS the exhaustive truth
    * set. That turns the bucket join's recall loss (measured 3096–3360
    * bp by `dedup_simhash_recall`) into a bounded 17× candidate-volume
    * cost — still bucket-bounded equi-join work, never all-pairs. The
    * multiprobe explode happens on 4-byte signatures, not documents, so
    * the blown-up side stays sketch-sized at any corpus scale. */
  private def simhashMultiprobePairs(sigs: DataFrame): DataFrame = {
    val bands = sigs.selectExpr("doc_id",
      "posexplode(array(sig DIV 65536, sig % 65536)) AS (band_idx, band_val)")
    // p = 0 keeps the half verbatim; p = 1..16 flips bit p-1
    val probed = bands
      .select(col("doc_id"), col("band_idx"),
        explode(sequence(lit(0), lit(16))).as("p"),
        col("band_val"))
      .selectExpr("doc_id", "band_idx",
        "CASE WHEN p = 0 THEN band_val ELSE band_val ^ shiftleft(1L, p - 1) END AS band_val")
    val cand = bands.as("a")
      .join(probed.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .selectExpr("id_a", "id_b", "CAST(bit_count(sig_a ^ sig_b) AS BIGINT) AS hamming")
      .filter(col("hamming") <= 3)
  }

  /** The multiprobe pipeline as a battery entry, pinned by the strongest
    * oracle available: the DuckDB side is the BRUTE-FORCE all-pairs
    * popcount truth, not a replica of the probing — a green hash PROVES
    * the 100%-recall guarantee instead of assuming it. */
  private val dedupSimhashMultiprobe: Q = (s, d) =>
    simhashMultiprobePairs(simhash32Sigs(s, d)).orderBy("id_a", "id_b")

  /** SimHash pair-recall AUDIT — the Hamming-space sibling of
    * `dedup_lsh_recall`: how many of the TRUE Hamming ≤ 3 signature
    * pairs does the 16-bit-half bit-sampling pipeline surface? Ground
    * truth is the deliberate all-pairs popcount scan over the 32-bit
    * signatures (at 100 TB this audit runs over a SAMPLE — signatures
    * are 4 bytes each, so even the brute side is sketch-sized, but the
    * pair count is still quadratic and the sampled audit is the
    * production shape); the found side is the identical bucketed
    * pipeline the battery runs, so found ⊆ true by construction. One
    * row per method: `half16` (the plain half-band join — a pair
    * escapes only when BOTH halves carry ≥ 1 differing bit, so its
    * pinned recall_bp documents what plain bucketing trades for linear
    * candidate volume) and `half16_probe1` (the multiprobe variant,
    * whose pigeonhole guarantee pins recall_bp at exactly 10000). */
  private val dedupSimhashRecall: Q = (s, d) => {
    val sigs = simhash32Sigs(s, d)
    val brute = sigs.as("x")
      .join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .selectExpr("x.doc_id AS id_a", "y.doc_id AS id_b",
        "CAST(bit_count(x.sig ^ y.sig) AS BIGINT) AS hamming")
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b")
    def audit(method: String, found: DataFrame): DataFrame =
      brute
        .join(found.select(col("id_a"), col("id_b"), lit(1L).as("found")),
          Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true_pairs"),
          sum(coalesce(col("found"), lit(0L))).as("n_found"))
        .select(lit(method).as("method"), col("n_true_pairs"), col("n_found"),
          floor(col("n_found") * 10000 / greatest(col("n_true_pairs"), lit(1L)))
            .cast("long").as("recall_bp"))
    audit("half16", simhashFoundPairs(sigs))
      .unionAll(audit("half16_probe1", simhashMultiprobePairs(sigs)))
      .orderBy("method")
  }

  private def duckSimhashPlanes(n: Int) = (0 until n).map { b =>
    s"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(wfps, f -> CAST(CASE WHEN ((f * ${2 * b + 3} + ${b * 7919}) % 65537) % 2 = 1 " +
      // 1L: plane 31's value overflows an Int shift to -2^31
      s"THEN 1 ELSE -1 END AS BIGINT))), (a, x) -> a + x) > 0 THEN ${1L << b} ELSE 0 END)"
  }
  private val duckSimhashBits = duckSimhashPlanes(8)

  /** Shared DuckDB CTE prefix for the 32-bit SimHash pair pipeline:
    * fixture → word fingerprints → signatures → half-bands → candidate
    * union → popcount-confirmed `pairs`. Used by both the pair query
    * and its recall audit so the two oracles cannot drift apart. */
  private lazy val duckSimhash32Ctes =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id, tokens[2:] AS tokens
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
       |  WHERE doc_id % 20 = 0),
       |wf AS (
       |  SELECT doc_id, list_transform(tokens, w -> ${duckFp("w")}) AS wfps
       |  FROM docs WHERE len(tokens) >= 3),
       |sigs AS (
       |  SELECT doc_id,
       |    CAST(${duckSimhashPlanes(32).mkString(" + ")} AS BIGINT) AS sig
       |  FROM wf),
       |bands AS (SELECT doc_id, sig, sig // 65536 AS b0, sig % 65536 AS b1 FROM sigs),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.b1 = b.b1 AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
       |  FROM cand
       |  JOIN sigs sa ON sa.doc_id = id_a
       |  JOIN sigs sb ON sb.doc_id = id_b)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "dedup_simhash" -> dedupSimhash,
    "dedup_simhash_pairs" -> dedupSimhashPairs,
    "dedup_simhash_multiprobe" -> dedupSimhashMultiprobe,
    "dedup_simhash_recall" -> dedupSimhashRecall,
  )

  val oracles: Map[String, String] = Map(
    "dedup_simhash" ->
      s"""WITH wf AS (SELECT doc_id,
         |  list_transform(string_split(text, ' '), w -> ${duckFp("w")}) AS wfps
         |  FROM documents)
         |SELECT doc_id, CAST(${duckSimhashBits.mkString(" + ")} AS INT) AS simhash8
         |FROM wf ORDER BY doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""$duckSimhash32Ctes
         |SELECT id_a, id_b, hamming FROM pairs
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash_multiprobe" ->
      // the STRONGEST oracle shape: brute-force all-pairs popcount
      // truth, not a probing replica — a green hash proves the
      // pigeonhole recall guarantee instead of assuming it
      s"""$duckSimhash32Ctes
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash_recall" ->
      // same CTEs as dedup_simhash_pairs, plus the all-pairs popcount
      // ground truth; recall = found/true in basis points. The
      // half16_probe1 row's n_found/recall are written as the truth
      // counts directly — the multiprobe guarantee — so a Spark-side
      // probing defect that drops any pair hash-mismatches here (and
      // row-by-row in dedup_simhash_multiprobe).
      s"""$duckSimhash32Ctes,
         |brute AS (
         |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.sig, y.sig)) <= 3),
         |found AS (SELECT id_a, id_b FROM pairs WHERE hamming <= 3),
         |half16 AS (
         |  SELECT 'half16' AS method,
         |    CAST(count(*) AS BIGINT) AS n_true_pairs,
         |    CAST(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         |    CAST(floor(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) * 10000
         |      / greatest(count(*), 1)) AS BIGINT) AS recall_bp
         |  FROM brute b LEFT JOIN found f ON b.id_a = f.id_a AND b.id_b = f.id_b),
         |probe1 AS (
         |  SELECT 'half16_probe1' AS method,
         |    CAST(count(*) AS BIGINT) AS n_true_pairs,
         |    CAST(count(*) AS BIGINT) AS n_found,
         |    CAST(CASE WHEN count(*) = 0 THEN 0 ELSE 10000 END AS BIGINT) AS recall_bp
         |  FROM brute)
         |SELECT * FROM half16 UNION ALL SELECT * FROM probe1 ORDER BY method""".stripMargin,
  )
}
