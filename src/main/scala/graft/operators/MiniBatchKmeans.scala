package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MINI-BATCH k-means updating (Sculley 2010, "Web-scale k-means
  * clustering") — the incremental re-training step between full
  * `sim_kmeans_train` runs: each arriving batch is assigned to the
  * current centroids and folds into them as a count-weighted running
  * mean. Paired with the maintained IVF layout this completes the ANN
  * training lifecycle: full train (batch k-means) → serve (bucketed
  * layout + probed reads) → maintain (index merge) → drift audit →
  * incremental re-train (this) → re-bucket when drift warrants.
  *
  * Same exactness discipline as `sim_kmeans_train`: e6-integer space
  * throughout — the update is component' = floor((comp·n + Σbatch) /
  * (n + m)) with exact int64 products (|comp| ≤ 4e6, n bounded by
  * corpus size; the product stays far under 2^63) — so a stream of
  * batches and a driver-side replay of the same batches produce
  * IDENTICAL centroids (EventStreamsSpec pins it).
  *
  * Scale shape per batch: one k·dim-int broadcast, a map-side k-way
  * distance scan, an argmin window keyed on vec_id, a (k·dim)-group
  * partial-aggregated sum, and a k·dim driver sync — O(batch), never
  * O(corpus).
  */
object MiniBatchKmeans {

  /** (centroid_id, components-e6, accumulated member count). */
  type Cents = Seq[(Int, Seq[Long], Long)]

  /** The deterministic grid init shared with `sim_kmeans_train`. */
  def gridInit(k: Int, dim: Int = 64): Cents =
    (0 until k).map(j =>
      (j, Seq.tabulate(dim)(i => (((j * 31 + i * 17) % 19) - 9) * 100000L), 0L))

  /** One mini-batch step: assign `batch` (vec_id, embedding) to the
    * nearest current centroid, fold the batch's per-dimension sums into
    * the running means. Centroids with no batch members are unchanged. */
  def step(batch: DataFrame, cents: Cents): Cents = {
    val s = batch.sparkSession
    import s.implicits._
    val cdf = cents.map { case (cid, v, _) => (cid, v) }.toDF("centroid_id", "cvec")
    val eq = batch.selectExpr("vec_id",
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS eq")
    val dists = eq.crossJoin(broadcast(cdf))
      .selectExpr("vec_id", "eq", "centroid_id",
        "aggregate(zip_with(eq, cvec, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x) AS dist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("dist"), col("centroid_id"))
    val sums = dists.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("centroid_id"), posexplode(col("eq")).as(Seq("pos", "v")))
      .groupBy("centroid_id", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("m"))
      .collect()
    val byCid = sums.groupBy(_.getInt(0))
    cents.map { case (cid, comps, n) =>
      byCid.get(cid) match {
        case None => (cid, comps, n)
        case Some(rows) =>
          val m = rows.head.getLong(3)
          val sv = rows.sortBy(_.getInt(1)).map(_.getLong(2))
          val upd = comps.zip(sv).map { case (c, sB) =>
            // pure int64: |c|·n ≤ 4e6·n stays far under 2^63 for any
            // realistic accumulated count; floorDiv matches the batch
            // trainer's floor semantics for negative sums
            Math.floorDiv(c * n + sB, n + m)
          }
          (cid, upd, n + m)
      }
    }
  }
}
