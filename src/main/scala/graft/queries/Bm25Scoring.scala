package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single source of truth for BM25 lexical scoring (k1 = 1.2,
  * b = 0.75 — Robertson/Sparck Jones defaults, the same constants the
  * reference's Elasticsearch `match` scoring uses,
  * chatbot_api.py:202-217): term-frequency / document-length columns, the
  * corpus-stats aggregate, and the score expression — emitted for BOTH
  * engines so `search_bm25` and the hybrid fusion queries
  * (`search_hybrid`, `search_hybrid_lang`, VERDICT r9 #2) cannot drift
  * from each other or from their oracles.
  *
  * Engine parity: dl and tf are integer counts held in doubles (exact),
  * df/avgdl come from one aggregate over them (exact), and the score sums
  * per-term contributions left-associated in `Terms` order, so Spark and
  * DuckDB execute the identical float-op sequence.
  *
  * Scale posture: two passes — one partial-aggregated corpus-stats pass,
  * broadcast back over the scan as a 1-row cross join (never a window
  * over a single partition); the per-document score is straight-line
  * arithmetic inside whole-stage codegen.
  */
private[queries] object Bm25Scoring {

  /** Query terms, shared with the keyword fixtures across the battery. */
  val Terms: Seq[String] = Seq("spark", "join", "filter")

  /** Per-document columns: `dl` + one `tf_<term>` per term, from `text`. */
  def tfCols: Seq[Column] =
    expr("CAST(size(split(text, ' ')) AS DOUBLE)").as("dl") +:
      Terms.map(t =>
        expr(s"CAST(size(filter(split(text, ' '), x -> x = '$t')) AS DOUBLE)")
          .as(s"tf_$t"))

  /** Corpus-stats aggregates over a frame carrying [[tfCols]]; the caller
    * prepends `count(lit(1)).cast("double").as("n_docs")` (Spark's `agg`
    * takes (first, rest)). */
  def statAggs: Seq[Column] =
    avg("dl").as("avgdl") +:
      Terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1.0).otherwise(0.0)).as(s"df_$t"))

  val nDocsAgg: Column = count(lit(1)).cast("double").as("n_docs")

  /** BM25 score as a SQL expression over tf/dl + broadcast stats columns. */
  val scoreExpr: String = Terms.map(t =>
    s"ln(1.0D + (n_docs - df_$t + 0.5D) / (df_$t + 0.5D)) * " +
      s"(tf_$t * 2.2D) / (tf_$t + 1.2D * (0.25D + 0.75D * dl / avgdl))")
    .mkString(" + ")

  // ------------------------------------------------------ DuckDB twins

  val duckTfCols: Seq[String] =
    "CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl" +:
      Terms.map(t =>
        s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS DOUBLE) AS tf_$t")

  val duckStatCols: Seq[String] =
    "CAST(count(*) AS DOUBLE) AS n_docs" +: "avg(dl) AS avgdl" +:
      Terms.map(t =>
        s"sum(CASE WHEN tf_$t > 0 THEN 1.0 ELSE 0.0 END) AS df_$t")

  val duckScore: String = Terms.map(t =>
    s"ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5))\n      " +
      s"* (tf_$t * 2.2) / (tf_$t + 1.2 * (0.25 + 0.75 * dl / avgdl))")
    .mkString("\n  + ")
}
