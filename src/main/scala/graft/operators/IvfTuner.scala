package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF list-count tuning — the coarse-quantizer twin of [[LshTuner]]:
  * pick the smallest power-of-two `nlist` whose PROBED row volume per
  * query stays bounded, from a cheap occupancy census — one
  * partial-aggregated groupBy over the assignments, run BEFORE
  * committing to `Layout.writeIvfBucketed`'s partition map.
  *
  * Why this lever exists: a fixed `nlist` means each inverted list —
  * and therefore every probed read — grows LINEARLY with the corpus
  * (BENCH_scale r15 measured `sim_ivf_topk`/`sim_ivfpq_topk` ×8 time
  * ratios 2.67/2.77 at the battery's fixed 16). Theory offers the
  * √N rule (FAISS guideline nlist ≈ 4√N..16√N, balancing the write-time
  * assignment cost N·nlist against the read-time probe cost
  * nprobe·N/nlist — [[sqrtNlist]] computes its integer-exact pow2
  * form), but √N still lets probed rows grow ∝√N. Production ANN
  * serving wants the probe cost FLAT, so — exactly like
  * [[LshTuner.chooseBandBits]] — the census measures the real probed
  * volume at doubling widths and stops at the smallest one under the
  * bound: smallest, because every extra list at fixed nprobe shrinks
  * the probed fraction and can only cost recall.
  *
  * Scale posture: each census step is one aggregate over
  * (centroid_id) — compact keys, full map-side partial aggregation —
  * and widths double, so the total census cost is ≤ 2× the final
  * width's single assignment pass; the probed read it protects then
  * reads nprobe bounded partitions of the bucketed layout instead of
  * a corpus-sized inverted list.
  */
object IvfTuner {

  /** One census pass at a candidate width: corpus size, the hottest
    * list, and the rows the canonical query (q = 0.1·1⃗, the battery's
    * fixed probe vector) would read through its `nprobe` nearest
    * lists. */
  final case class Census(nlist: Int, nprobe: Int, nRows: Long,
                          maxList: Long, probedRows: Long)

  /** Deterministic centroid grid c_j[i] = (((j·31 + i·17) mod 19) − 9)/10
    * — the same data-independent formula as
    * [[graft.expressions.IvfAssign]], valid for ANY j, which is what
    * makes the width tunable without retraining. */
  private def centroid(j: Int, i: Int): Double = (((j * 31 + i * 17) % 19) - 9) / 10.0

  /** The `nprobe` centroids nearest (squared L2, ties to the lowest id)
    * to the canonical query vector, at width `nlist` — driver-side
    * arithmetic over the formula grid, no data touched. */
  def probeList(nlist: Int, nprobe: Int, dim: Int = 64): Seq[Int] =
    (0 until nlist).map { j =>
      val d = (0 until dim).map { i => val df = 0.1 - centroid(j, i); df * df }.sum
      (j, d)
    }.sortBy { case (j, d) => (d, j) }.take(nprobe).map(_._1)

  /** The integer-exact √N seed: the smallest power of two `v` in
    * [minNlist, maxNlist] with v·v ≥ nRows. Pure arithmetic (no libm
    * log/sqrt, so a DuckDB oracle replays it bit-for-bit); use it when
    * even a census pass is too expensive, accepting probed rows that
    * grow ∝√N instead of staying flat. */
  def sqrtNlist(nRows: Long, minNlist: Int = 16, maxNlist: Int = 65536): Int = {
    var v = minNlist
    while (v.toLong * v < nRows && v < maxNlist) v <<= 1
    v
  }

  def census(corpus: DataFrame, embCol: String, nlist: Int, nprobe: Int): Census = {
    val probes = probeList(nlist, nprobe)
    val row = corpus
      .selectExpr(s"graft_ivf_assign($embCol, $nlist) AS centroid_id")
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum("n"), lit(0L)).as("n_rows"),
        coalesce(max("n"), lit(0L)).as("max_list"),
        coalesce(sum(when(col("centroid_id").isin(probes: _*), col("n"))), lit(0L))
          .as("probed_rows"))
      .head()
    Census(nlist, nprobe, row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Smallest power-of-two width in [minNlist, maxNlist] whose measured
    * probed volume is ≤ `maxProbedRows` — with a PLATEAU stop: when a
    * doubling fails to cut the probed volume by ≥10%, an unsplittable
    * hot set (near-identical vectors sitting on the query) is flooring
    * it, and every further doubling would only cost recall, write-time
    * assignment (∝ nlist per vector), and census passes — the r16 ×32
    * scale harness measured exactly this, escalating 16→65536 for a
    * 113 s census that never met the bound. On plateau the PRE-plateau
    * census returns (same probed volume, narrower width, more recall);
    * the caller sees the measured volume either way. Probing from the
    * bottom keeps recall maximal and the write cheapest. */
  def chooseNlist(corpus: DataFrame, embCol: String, nprobe: Int = 4,
                  maxProbedRows: Long = 4096,
                  minNlist: Int = 16, maxNlist: Int = 65536): Census = {
    require(minNlist >= 1 && maxNlist <= 65536 && minNlist <= maxNlist,
      s"bad tuning range ($minNlist, $maxNlist)")
    require(nprobe >= 1 && nprobe <= minNlist,
      s"nprobe $nprobe must be in [1, minNlist $minNlist]")
    var cur = census(corpus, embCol, minNlist, nprobe)
    while (cur.probedRows > maxProbedRows && cur.nlist < maxNlist) {
      val next = census(corpus, embCol, math.min(cur.nlist << 1, maxNlist), nprobe)
      if (next.probedRows > (cur.probedRows * 9) / 10) return cur // plateau
      cur = next
    }
    cur
  }
}
