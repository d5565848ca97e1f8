package graft.functions

/** F24 — embedding-based semantic subject matcher (semantics of
  * `airflow/src/semantic_matcher.py:111-216`): normalized dot product
  * against a dim-sized subject embedding table, per-language thresholds
  * (0.38 en / 0.45 vi in the reference), top-3.
  *
  * The embedding *model* is out of scope here (no sentence-transformer in
  * this environment — the caller supplies vectors, e.g. from the
  * `embeddings` table or an offline encoder, exactly how the reference
  * receives precomputed E5 vectors at query time). The matcher itself is
  * pure vector algebra, serializable, broadcast-safe.
  */
final class SemanticMatcher(
    subjectVectors: Seq[(Int, Array[Float])],
    threshold: Double = 0.38,
    topK: Int = 3) extends Serializable {

  import SemanticMatcher._

  private val entries: Vector[(Int, Array[Double])] =
    subjectVectors.toVector.map { case (id, v) => (id, l2Normalize(v)) }

  /** Top-k subjects by cosine ≥ threshold, score-desc with id tiebreak. */
  def matchVector(query: Array[Float]): Seq[(Int, Double)] = {
    if (query == null || query.isEmpty) return Seq.empty
    val q = l2Normalize(query)
    entries.flatMap { case (id, v) =>
      if (v.length != q.length) None
      else {
        var dot = 0.0
        var i = 0
        while (i < q.length) { dot += q(i) * v(i); i += 1 }
        val sim = math.rint(dot * 10000) / 10000
        if (sim >= threshold) Some((id, sim)) else None
      }
    }.sortBy { case (id, sim) => (-sim, id) }.take(topK)
  }
}

object SemanticMatcher {
  private def l2Normalize(v: Array[Float]): Array[Double] = {
    val d = v.map(_.toDouble)
    val norm = math.sqrt(d.map(x => x * x).sum)
    if (norm == 0.0) d else d.map(_ / norm)
  }
}
