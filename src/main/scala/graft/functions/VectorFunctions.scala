package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra over `ArrayType(Float/Double)` columns built entirely
  * from Spark higher-order functions (`zip_with` + `aggregate`), so the
  * whole expression stays inside whole-stage codegen — no UDF, no
  * serialization cliff (SURVEY.md §4 "custom Catalyst work warranted").
  *
  * Semantics mirror the reference's cosine use: normalized dot product
  * (`elasticsearch_sync.py:327-333` dense_vector cosine;
  * `semantic_matcher.py:111-216`). Folds are sequential left-to-right,
  * matching DuckDB's list reductions, which keeps float results
  * bit-comparable for the oracle.
  */
object VectorFunctions {

  /** Elementwise cast to double so accumulation happens in f64. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (|a| * |b|). Callers cast to double first
    * (`toDouble`) so this matches a DuckDB `::DOUBLE[]` oracle bitwise.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane signature for LSH-bucketed ANN: `bits` pseudo-random
    * hyperplanes derived deterministically from (bit, dim) via a hash-based
    * pseudo-gaussian, folded into an integer bucket id. Deterministic across
    * runs and partitions — safe to use as a shuffle key at any scale.
    */
  def hyperplaneSignature(v: Column, dim: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      // hyperplane_b[i] = hash-derived value in [-0.5, 0.5)
      val proj = (0 until dim).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((b, i))
        val w = (math.abs(h.toLong) % 1000L).toDouble / 1000.0 - 0.5
        element_at(v, i + 1).cast("double") * lit(w)
      }.reduce(_ + _)
      when(proj >= 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }
}
