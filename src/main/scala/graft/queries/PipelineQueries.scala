package graft.queries

import org.apache.spark.sql.DataFrame

/** LLM-training-data pipeline operators (builder brief "beyond the
  * reference"): deduplication (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard), similarity search (brute-force cosine + LSH-bucketed ANN),
  * text analysis (language-ID, quality scoring, token counting, rolling
  * fingerprint), the hybrid lexical+vector retrieval of
  * `chatbot_api.py:188-274` (Q1-Q3), and an event-time window aggregate.
  *
  * Everything is native Catalyst higher-order functions — zero UDFs in
  * this file — so the whole battery stays inside whole-stage codegen and
  * the exact same arithmetic is expressible in the DuckDB oracle.
  *
  * Scale posture: per-document expressions are embarrassingly parallel;
  * near-dup joins go through shingle/LSH buckets (never all-pairs);
  * corpus-level maxima are 1-row broadcast joins, not windows over a
  * single partition.
  */
object PipelineQueries {

  type Q = PipelineShared.Q

  /** Tier files (r10 split of the former 2,300-line single object —
    * registry names and oracles unchanged): [[DedupQueries]],
    * [[VectorQueries]], [[TextCurationQueries]], [[ComposedQueries]],
    * with cross-tier plumbing in [[PipelineShared]]. */
  val queries: Seq[(String, Q)] =
    DedupQueries.queries ++ SimHashQueries.queries ++ VectorQueries.queries ++ EmbedNeardupQueries.queries ++ VectorIndexQueries.queries ++ PqQueries.queries ++ GraphAnnQueries.queries ++ GraphMetricsQueries.queries ++
      TextCurationQueries.queries ++ SamplerQueries.queries ++ LmQueries.queries ++ ClassifierQueries.queries ++ CorpusHygieneQueries.queries ++ BpeQueries.queries ++ TunerQueries.queries ++ MultimodalQueries.queries ++ ComposedQueries.queries ++ DistAggQueries.queries ++ SparseSimQueries.queries ++ EventAnalyticsQueries.queries

  val oracles: Map[String, String] =
    DedupQueries.oracles ++ SimHashQueries.oracles ++ VectorQueries.oracles ++ EmbedNeardupQueries.oracles ++ VectorIndexQueries.oracles ++ PqQueries.oracles ++ GraphAnnQueries.oracles ++ GraphMetricsQueries.oracles ++
      TextCurationQueries.oracles ++ SamplerQueries.oracles ++ LmQueries.oracles ++ ClassifierQueries.oracles ++ CorpusHygieneQueries.oracles ++ BpeQueries.oracles ++ TunerQueries.oracles ++ MultimodalQueries.oracles ++ ComposedQueries.oracles ++ DistAggQueries.oracles ++ SparseSimQueries.oracles ++ EventAnalyticsQueries.oracles

  private[queries] val IvfProbes: Seq[Int] = VectorQueries.IvfProbes

  private[queries] def withGoldenDigest(df: DataFrame, d: String, queryName: String): DataFrame =
    PipelineShared.withGoldenDigest(df, d, queryName)

  private[graft] def withGoldenDigestExpected(
      df: DataFrame, expected: Option[Long], queryName: String): DataFrame =
    PipelineShared.withGoldenDigestExpected(df, expected, queryName)
}
