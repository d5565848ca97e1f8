package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band-width tuning for banded sign-projection LSH (the
  * `graft_lsh_bands` family): pick the smallest `bandBits` whose
  * candidate-pair volume stays bounded per row, from a cheap bucket
  * census — one partial-aggregated groupBy over the signatures, run
  * BEFORE committing to the in-bucket self-join.
  *
  * Why a census and not the textbook rule: uniform-data theory says
  * occupancy E[N/2^bits] halves per added bit, so bits should grow with
  * log2(N) (+1 per corpus doubling). Measured on a clustered corpus
  * (r10 scale harness, rotated copies of an IVF-structured base), +1
  * bit per doubling still compounded — candidate pairs per row grew
  * 17.6 → 52 → 115 at 8/11/13 bits across ×1/×8/×32 — because the
  * deterministic hyperplanes split tight clusters weakly; the census
  * found this corpus needs ~2-3 bits per doubling (8/14/20 holds
  * pairs/row flat), turning a 146-226 s ×32 join into 5-6 s. The census
  * itself cost 0.5/2.4/6.4 s at ×1/×8/×32 — amortized noise next to
  * the join it protects.
  *
  * At 100 TB the same shape holds: the census is a single shuffle on
  * (band, signature) — the exact shuffle the join would do — so its
  * cost is one aggregation pass over compact keys, and the chosen width
  * is a measured property of the real data, not a guess about its
  * distribution.
  */
object LshTuner {

  /** One census pass: candidate-pair volume (Σ n·(n−1)/2 over buckets —
    * the in-bucket join's output size before any distinct), the max
    * bucket occupancy, and the row count, at a given width. */
  final case class Census(bits: Int, candPairs: Long, maxBucket: Long, nRows: Long) {
    def pairsPerRow: Double = candPairs.toDouble / math.max(nRows, 1L)
  }

  def census(corpus: DataFrame, embCol: String, bands: Int, bits: Int): Census = {
    val row = corpus
      .selectExpr(s"posexplode(graft_lsh_bands($embCol, $bands, $bits)) AS (band_idx, band_sig)")
      .groupBy("band_idx", "band_sig").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("cand_pairs"),
        coalesce(max("n"), lit(0L)).as("max_bucket"),
        coalesce(sum("n"), lit(0L)).as("n_rows"))
      .head()
    Census(bits, row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Smallest width in [minBits, maxBits] (probed in `step`s) whose
    * candidate volume is ≤ `maxPairsPerRow`; returns the last census if
    * even maxBits exceeds the bound (the caller sees the measured
    * volume either way). Probing from the bottom keeps recall maximal:
    * every extra bit can only drop near-duplicate candidates. */
  def chooseBandBits(corpus: DataFrame, embCol: String, bands: Int,
                     maxPairsPerRow: Double = 24.0,
                     minBits: Int = 8, maxBits: Int = 24, step: Int = 2): Census = {
    require(minBits >= 1 && maxBits <= 30 && minBits <= maxBits && step >= 1,
      s"bad tuning range ($minBits, $maxBits, $step)")
    var bits = minBits
    var last = census(corpus, embCol, bands, bits)
    while (last.pairsPerRow > maxPairsPerRow && bits < maxBits) {
      bits = math.min(bits + step, maxBits)
      last = census(corpus, embCol, bands, bits)
    }
    last
  }
}
