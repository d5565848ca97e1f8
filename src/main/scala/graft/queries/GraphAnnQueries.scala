package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** GRAPH-BASED ANN (r14, VERDICT r13 #1) — the one reference technology
  * the IVF/PQ tier did not yet represent: the reference's serving index
  * is ES HNSW (m=16, ef_construction=200, `MIGRATION_E5.md:97-111`;
  * dense_vector mapping at `elasticsearch_sync.py:327-333`). HNSW is a
  * pointer-chasing in-RAM structure; its SPARK-NATIVE re-expression is
  * relational: the graph is a NEIGHBOR TABLE (src, dst) built once as a
  * bounded equi-join pipeline, and a query is a BOUNDED BEAM SEARCH —
  * a fixed number of frontier-expansion joins (fixed hop count ⇒ the
  * physical plan is static, no driver-side iteration on data values).
  *
  * Graph build (the k-NN-graph construction NN-Descent approximates):
  *  - candidate edges from MULTIPROBE LSH: each node keys by its 8-bit
  *    hyperplane signature (`graft_lsh_bands`, the `sim_lsh_buckets`
  *    partitioner) and probes its own bucket plus the 8 Hamming-1
  *    buckets — a 9-key banded equi-join, never all-pairs; Hamming-1
  *    probing supplies the CROSS-bucket links beam navigation needs
  *    (the flat analogue of HNSW's upper-layer long-range edges).
  *  - per-node out-edges = top-M candidates by exact pairwise cosine
  *    (native `graft_cosine`, e6 fixed point, dst tie-break) — the
  *    neighbor-selection heuristic of HNSW §4 alg 3 reduced to its
  *    deterministic core; then SYMMETRIZE (union with reversed edges,
  *    distinct) so navigation can traverse either direction, and
  *    RE-PRUNE to 2M per node — HNSW's M_max shrink of incoming links,
  *    without which a hub node's degree (and a hop's expansion) is
  *    unbounded.
  *  - entry point = exhaustive scan of a deterministic 1/16 sample
  *    (vec_id % 16 = 0) — the relational stand-in for HNSW's upper
  *    layers: a small set searched exactly, seeding the bottom-layer
  *    walk.
  *
  * Beam search (ef=Beam, fixed Hops): each hop expands the current
  * top-Beam frontier through the neighbor table (a broadcast join of a
  * ≤Beam-row frontier against the edge table), scores arrivals against
  * the query via the precomputed per-node cosine, and folds them into
  * the visited set; the answer is the top-k of everything visited. The
  * visited-set SIZE rides the output, so a walk that expands more or
  * fewer nodes than the oracle's replay breaks the hash, not just the
  * ranking.
  *
  * Scale posture: the signature join is the same banded candidate
  * machinery every dedup entry uses (bounded by Σ(bucket+probe) sizes,
  * never quadratic in the corpus); per-node top-M is a TopKPerKey-shape
  * window; each hop moves ≤ Beam·2M candidate rows through a broadcast
  * join — the whole query path after the entry scan touches O(Beam·2M·
  * Hops) rows regardless of corpus size. `sim_recall_at_k`'s hnsw_beam
  * row prices what this navigation buys vs IVF/IVF-PQ at equal probe
  * budget.
  */
private[graft] object GraphAnnQueries {

  private[queries] val M = 4 // out-degree kept per node (pruned k-NN graph)
  private[queries] val Beam = 8 // beam width (HNSW ef)
  private[queries] val Hops = 3 // fixed expansion rounds ⇒ static plan
  private[queries] val EntryStride = 16 // upper-layer sample: vec_id % 16 = 0

  private val qCosE6 =
    "CAST(floor(graft_cosine(embedding, array_repeat(CAST(0.1 AS DOUBLE), 64)) " +
      "* 1000000) AS BIGINT)"

  /** Symmetrized pruned k-NN neighbor table: (src, dst), degree ≤ 2M. */
  private[queries] def edgesDf(s: SparkSession, d: String): DataFrame = {
    val sig = Tables.embeddings(s, d)
      .selectExpr("vec_id", "embedding",
        "element_at(graft_lsh_bands(embedding, 1, 8), 1) AS sig")
      .localCheckpoint() // feeds both sides of the probe join once
    val flips = (0 until 8).map(b => s"sig ^ ${1 << b}").mkString(", ")
    val probes = sig.selectExpr("vec_id AS src", "embedding AS ea",
      s"explode(array(sig, $flips)) AS key")
    val cand = probes
      .join(sig.selectExpr("vec_id AS dst", "embedding AS eb", "sig AS key"),
        Seq("key"))
      .filter(col("src") =!= col("dst"))
      .selectExpr("src", "dst",
        "CAST(floor(graft_cosine(ea, eb) * 1000000) AS BIGINT) AS pair_e6")
    val w = Window.partitionBy("src").orderBy(col("pair_e6").desc, col("dst").asc)
    val outEdges = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= M).select("src", "dst", "pair_e6")
    // Symmetrize, then RE-PRUNE to 2M per node (HNSW's M_max shrink of
    // incoming links): without it a hub landing in many nodes' top-M
    // has unbounded degree and a single hop's expansion is unbounded
    // too. Reversed edges carry the same pair score, so the mutual-edge
    // duplicate collapses under distinct before the prune.
    val sym = outEdges
      .union(outEdges.select(col("dst").as("src"), col("src").as("dst"),
        col("pair_e6")))
      .distinct()
    sym.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 * M).select("src", "dst")
  }

  /** The visited set of the bounded beam walk: (vec_id, cos_e6). */
  private[queries] def visitedDf(s: SparkSession, d: String): DataFrame = {
    val edges = edgesDf(s, d).localCheckpoint() // traversed once per hop
    val scored = Tables.embeddings(s, d)
      .selectExpr("vec_id", s"$qCosE6 AS cos_e6")
      .localCheckpoint() // arrival scoring for every hop
    var visited = scored.filter(col("vec_id") % EntryStride === 0)
      .orderBy(col("cos_e6").desc, col("vec_id").asc).limit(Beam)
    for (_ <- 1 to Hops) {
      val frontier = visited
        .orderBy(col("cos_e6").desc, col("vec_id").asc).limit(Beam)
        .select(col("vec_id").as("src"))
      val expand = edges.join(broadcast(frontier), Seq("src"))
        .select(col("dst").as("vec_id")).distinct()
        .join(scored, Seq("vec_id"))
      visited = visited.union(expand).distinct()
    }
    visited
  }

  /** Graph-ANN top-k through the relational HNSW walk; the visited-set
    * size rides the hash so the navigation itself is pinned, not only
    * the final ranking. */
  private val simHnswTopk: Q = (s, d) => {
    val visited = visitedDf(s, d).localCheckpoint()
    val nv = visited.agg(count(lit(1)).as("n_visited"))
    visited.crossJoin(broadcast(nv))
      .orderBy(col("cos_e6").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "cos_e6", "n_visited")
  }

  /** Build-side census: degree histogram of the symmetrized neighbor
    * table — pins the candidate join + top-M prune + symmetrize chain
    * independently of any query walk (degree ≤ 2M by construction; a
    * probe-set or prune regression moves a histogram row). */
  private val simHnswDegree: Q = (s, d) =>
    edgesDf(s, d)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  val queries: Seq[(String, Q)] = Seq(
    "sim_hnsw_topk" -> simHnswTopk,
    "sim_hnsw_degree" -> simHnswDegree,
  )

  // ------------------------------------------------------- DuckDB replay

  /** Pairwise cosine e6 — the graft_cosine fold pair (dot zip, two
    * sum-sq norms), same fragment `search_rag_mmr`'s sims CTE pins. */
  private def duckPairCos(ea: String, eb: String): String =
    s"""CAST(floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_zip($ea, $eb),
       |        pz -> CAST(pz[1] AS DOUBLE) * CAST(pz[2] AS DOUBLE))),
       |      (af, xf) -> af + xf)
       |    / (sqrt(${duckSumSqOf(ea)}) * sqrt(${duckSumSqOf(eb)})))
       |  * 1000000) AS BIGINT)""".stripMargin

  /** Query cosine e6 vs q = 0.1·1⃗ — mirrors the sim_cosine_native
    * oracle's three sequential folds. */
  private val duckQCos: String =
    s"""CAST(floor(
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(0.1 AS DOUBLE))), (a, x) -> a + x)
       |  / (sqrt($duckSumSq)
       |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(embedding,
       |           x -> CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE))), (a, x) -> a + x)))
       |  * 1000000) AS BIGINT)""".stripMargin

  /** CTE chain through the symmetrized edge table, prefix-namespaced so
    * it splices into other oracles (the recall audit) collision-free. */
  private[queries] def duckEdgeCtes(p: String): String = {
    val probeList = "sig" +: (0 until 8).map(b => s"xor(sig, ${1 << b})")
    s"""${p}sig AS (
       |  SELECT vec_id, embedding,
       |    ${VectorQueries.duckLshBits("embedding").mkString(" + ")} AS sig
       |  FROM embeddings),
       |${p}probes AS (
       |  SELECT vec_id, embedding, u.k AS key
       |  FROM ${p}sig, UNNEST([${probeList.mkString(", ")}]) u(k)),
       |${p}cand AS (
       |  SELECT p.vec_id AS src, t.vec_id AS dst,
       |    ${duckPairCos("p.embedding", "t.embedding")} AS pair_e6
       |  FROM ${p}probes p JOIN ${p}sig t
       |    ON p.key = t.sig AND p.vec_id <> t.vec_id),
       |${p}out AS (
       |  SELECT src, dst, pair_e6 FROM (
       |    SELECT src, dst, pair_e6,
       |      row_number() OVER (PARTITION BY src ORDER BY pair_e6 DESC, dst ASC) AS rn
       |    FROM ${p}cand) r WHERE rn <= $M),
       |${p}sym AS (
       |  SELECT DISTINCT src, dst, pair_e6 FROM (
       |    SELECT src, dst, pair_e6 FROM ${p}out
       |    UNION ALL SELECT dst AS src, src AS dst, pair_e6 FROM ${p}out) u2),
       |${p}edges AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY pair_e6 DESC, dst ASC) AS rn
       |    FROM ${p}sym) r2 WHERE rn <= ${2 * M})""".stripMargin
  }

  /** CTE chain for the full walk: edges + per-node query cosine + the
    * unrolled hops; the final visited set is `${p}v$Hops`. */
  private[queries] def duckVisitedCtes(p: String): String = {
    val hops = (1 to Hops).map { h =>
      s"""${p}f$h AS (
         |  SELECT vec_id FROM ${p}v${h - 1}
         |  ORDER BY cos_e6 DESC, vec_id ASC LIMIT $Beam),
         |${p}x$h AS (
         |  SELECT DISTINCT s.vec_id, s.cos_e6
         |  FROM ${p}f$h f JOIN ${p}edges e ON e.src = f.vec_id
         |  JOIN ${p}scored s ON s.vec_id = e.dst),
         |${p}v$h AS (
         |  SELECT DISTINCT vec_id, cos_e6 FROM (
         |    SELECT vec_id, cos_e6 FROM ${p}v${h - 1}
         |    UNION ALL SELECT vec_id, cos_e6 FROM ${p}x$h) u$h)""".stripMargin
    }.mkString(",\n")
    s"""${duckEdgeCtes(p)},
       |${p}scored AS (SELECT vec_id, $duckQCos AS cos_e6 FROM embeddings),
       |${p}v0 AS (
       |  SELECT vec_id, cos_e6 FROM ${p}scored WHERE vec_id % $EntryStride = 0
       |  ORDER BY cos_e6 DESC, vec_id ASC LIMIT $Beam),
       |$hops""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sim_hnsw_topk" ->
      s"""WITH ${duckVisitedCtes("h")}
         |SELECT vec_id, cos_e6,
         |  (SELECT CAST(count(*) AS BIGINT) FROM hv$Hops) AS n_visited
         |FROM hv$Hops ORDER BY cos_e6 DESC, vec_id ASC LIMIT 10""".stripMargin,
    "sim_hnsw_degree" ->
      s"""WITH ${duckEdgeCtes("g")},
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
         |        FROM gedges GROUP BY src)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,
  )
}
