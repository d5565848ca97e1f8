package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.PipelineShared._

/** Graph-structure metrics over the k-NN neighbor table (the
  * [[GraphAnnQueries]] edge machinery) beyond centrality: exact
  * triangle counting and local clustering coefficients — the standard
  * graph-health census for a similarity graph (a near-dup cluster shows
  * up as a dense triangle-rich pocket; a healthy ANN navigation graph
  * keeps clustering moderate so greedy walks don't trap). Suri &
  * Vassilvitskii 2011 ("Counting triangles and the curse of the last
  * reducer") is the MapReduce-era statement of the skew problem the
  * orientation trick solves.
  */
private[queries] object GraphMetricsQueries {

  /** EXACT TRIANGLE CENSUS — degree-ordered orientation then one
    * 2-path equi-join closed by a second equi-join. Orienting every
    * undirected edge from its (degree, id)-smaller endpoint bounds
    * out-degree by O(√m) REGARDLESS of hubs (the classic
    * last-reducer fix; on top of the table's own 2M cap), so the
    * 2-path volume Σ outdeg² can't blow up on a skewed node. Each
    * triangle is emitted exactly once (its unique cyclic orientation).
    * Output: top-20 nodes by triangle participation with undirected
    * degree and the local clustering coefficient in integer e4
    * (2·tri·1e4 DIV deg·(deg−1)), global triangle/edge totals riding
    * every row.
    *
    * Scale posture: all joins are equi-joins on node ids; the census
    * per-node aggregation is a partial agg; nothing is all-pairs —
    * at 100 TB this is the textbook distributed triangle count. */
  private val graphTriangles: Q = (s, d) => {
    val edges = GraphAnnQueries.edgesCkpt(s, d)
    // canonical undirected edge set: a pair counts if EITHER pruned
    // direction survived (the post-symmetrize prune can keep just one)
    val und = edges.selectExpr("least(src, dst) AS u0", "greatest(src, dst) AS v0")
      .distinct().localCheckpoint()
    triangleCensus(und)
      .orderBy(col("n_tri").desc, col("vec_id").asc).limit(20)
  }

  /** The census core over a canonical `(u0 < v0)` undirected edge
    * frame — exposed for GraphMetricsSpec's known-count fixtures
    * (complete graphs, triangle-free paths), since the battery oracle
    * REPLAYS the same orientation algorithm and would not catch a
    * conceptual miscount both engines share. Returns one row per
    * triangle-participating node plus the global totals on every row. */
  private[queries] def triangleCensus(und: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val degU = und.select(col("u0").as("vec_id"))
      .unionAll(und.select(col("v0").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val or = und
      .join(degU.select(col("vec_id").as("u0"), col("deg").as("du")), Seq("u0"))
      .join(degU.select(col("vec_id").as("v0"), col("deg").as("dv")), Seq("v0"))
      .selectExpr(
        "CASE WHEN du < dv OR (du = dv AND u0 < v0) THEN u0 ELSE v0 END AS u",
        "CASE WHEN du < dv OR (du = dv AND u0 < v0) THEN v0 ELSE u0 END AS v")
      .localCheckpoint() // feeds all three legs of the triangle join
    val tri = or.as("a")
      .join(or.as("b"), col("a.v") === col("b.u"))
      .join(or.as("c"),
        col("c.u") === col("a.u") && col("c.v") === col("b.v"))
      .select(col("a.u").as("x"), col("a.v").as("y"), col("b.v").as("z"))
      .localCheckpoint() // feeds the per-node census and the total
    val perNode = tri.select(col("x").as("vec_id"))
      .unionAll(tri.select(col("y").as("vec_id")))
      .unionAll(tri.select(col("z").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("n_tri"))
    val totals = tri.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
    perNode.join(degU, Seq("vec_id"))
      .selectExpr("vec_id", "deg", "n_tri",
        "(20000 * n_tri) DIV (deg * (deg - 1)) AS cc_e4")
      .crossJoin(broadcast(totals))
  }

  /** CANONICAL representative selection — the composition PageRank was
    * built for (VERDICT r13): instead of keeping each near-dup
    * cluster's arbitrary min-id member, keep its best-CONNECTED member
    * under the embedding k-NN graph's centrality ranking. Clusters come
    * from the [[DedupQueries]] Jaccard connected components (whose
    * injected +100000 near-copies read their source doc's rank — a
    * synthetic twin has its source's embedding); the representative is
    * the (rank desc, id asc) head of each multi-member cluster, via a
    * cluster-partitioned window (distributed; clusters are near-dup
    * sized, never corpus sized). Rankless members (isolated in the k-NN
    * graph) rank 0 — an arbitrary-looking min-id survivor only wins if
    * NO member is connected. Output: one row per multi-member cluster
    * with membership census and the canonical pick.
    *
    * Scale posture: components are the adaptive pointer-jumping op
    * (O(log diameter) rounds), ranks are the bounded-degree PageRank
    * table, and the final pick is one window over cluster-sized
    * groups — all three tiers already priced in BENCH_scale. */
  private val dedupCanonical: Q = (s, d) => {
    val comps = DedupQueries.jaccardComponentsCkpt(s, d)
    val ranks = GraphAnnQueries.pagerankRanksCkpt(s, d)
    val members = comps
      .join(ranks.withColumnRenamed("vec_id", "emb_id"),
        comps("id") % 100000L === col("emb_id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(col("r"), lit(0L)).as("r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("r").desc, col("id").asc)
    members.withColumn("rn", row_number().over(w))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum("id").as("sum_member_ids"),
        max(when(col("rn") === 1, col("id"))).as("canonical_id"),
        max(when(col("rn") === 1, col("r"))).as("canonical_rank_e6"))
      .filter(col("n_members") >= 2)
      .orderBy("cluster_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "graph_triangles" -> graphTriangles,
    "dedup_canonical" -> dedupCanonical,
  )

  val oracles: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH ${GraphAnnQueries.duckEdgeCtes("g")},
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u0, greatest(src, dst) AS v0
         |  FROM gedges),
         |degu AS (
         |  SELECT vec_id, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT u0 AS vec_id FROM und
         |    UNION ALL SELECT v0 AS vec_id FROM und) e
         |  GROUP BY 1),
         |orient AS (
         |  SELECT CASE WHEN du.deg < dv.deg
         |      OR (du.deg = dv.deg AND u0 < v0) THEN u0 ELSE v0 END AS u,
         |    CASE WHEN du.deg < dv.deg
         |      OR (du.deg = dv.deg AND u0 < v0) THEN v0 ELSE u0 END AS v
         |  FROM und
         |  JOIN degu du ON du.vec_id = u0
         |  JOIN degu dv ON dv.vec_id = v0),
         |tri AS (
         |  SELECT a.u AS x, a.v AS y, b.v AS z
         |  FROM orient a
         |  JOIN orient b ON b.u = a.v
         |  JOIN orient c ON c.u = a.u AND c.v = b.v),
         |pn AS (
         |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |    SELECT x AS vec_id FROM tri
         |    UNION ALL SELECT y AS vec_id FROM tri
         |    UNION ALL SELECT z AS vec_id FROM tri) t
         |  GROUP BY 1),
         |tots AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
         |    (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges)
         |SELECT p.vec_id, d.deg, p.n_tri,
         |  CAST((20000 * p.n_tri) // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_e4,
         |  t.n_triangles, t.n_edges
         |FROM pn p JOIN degu d ON d.vec_id = p.vec_id, tots t
         |ORDER BY p.n_tri DESC, p.vec_id ASC LIMIT 20""".stripMargin,
    // CC chain names (docs/corpus/shingles/…/reach) and the pagerank
    // chain (g-prefixed + pr0..prN) are disjoint, so both splice into
    // one WITH RECURSIVE
    "dedup_canonical" ->
      s"""WITH RECURSIVE ${DedupQueries.duckCcChain},
         |${GraphAnnQueries.duckPagerankCtes},
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |members AS (
         |  SELECT c.id, c.cluster_id, coalesce(p.r, 0) AS r
         |  FROM comp c
         |  LEFT JOIN pr${GraphAnnQueries.PrIters} p ON p.vec_id = c.id % 100000),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY r DESC, id ASC) AS rn
         |  FROM members)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(id) AS BIGINT) AS sum_member_ids,
         |  CAST(max(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS canonical_id,
         |  CAST(max(CASE WHEN rn = 1 THEN r END) AS BIGINT) AS canonical_rank_e6
         |FROM rk GROUP BY cluster_id HAVING count(*) >= 2
         |ORDER BY cluster_id""".stripMargin,
  )
}
