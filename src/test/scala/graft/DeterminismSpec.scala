package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-determinism sweep: every relational registry query must
  * produce the IDENTICAL multiset of rows when the shuffle-partition
  * count changes (4 — the suite default — vs 13, a prime that divides
  * nothing). This is the third robustness sweep next to EmptyInputSpec
  * and NullInputSpec, and it pins the property every determinism claim
  * in the engine rests on: results are a pure function of the DATA, not
  * of cluster width, reduce order, or which partition saw a row first.
  * The classic failures it exists to catch: `rand()`-style sampling,
  * first/any aggregates without an ordering, partition-order-dependent
  * window frames, and float accumulations whose fixed-point projection
  * straddles a grid cell under a different summation order. At 100 TB
  * this property is what makes the battery's hashes reproducible on a
  * 1000-executor cluster that will never match the test harness's
  * parallelism.
  *
  * Comparison is string-exact per cell (bit-exact for doubles): the
  * engine's outputs are deliberately integer/fixed-point almost
  * everywhere, and where raw doubles surface they are per-row
  * arithmetic, not cross-partition folds.
  *
  * Skips: the CDC/state tier (the i-/k-prefixed merge queries plus the
  * composed lifecycles — they MUTATE `target/graft-state`, so a second
  * in-session run is a different lifecycle step; their determinism is
  * pinned by TableMergeSpec / SilverPipelineSpec / their golden
  * digests) and the sink/file-layout tier (the source/sink queries
  * rewrite fixture files at construction; their checks live in
  * SinkQueries' own oracle rows).
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"

  test("registry size is pinned (a future split cannot silently shrink the sweeps)") {
    // the three registry-wide sweeps (this suite, EmptyInputSpec,
    // NullInputSpec) enumerate SparkEntry.all — pin its size so a
    // refactor that drops a tier from the concatenation fails HERE,
    // loudly, instead of quietly running fewer robustness tests.
    // Update the number when a round adds entries (r19: 253).
    assert(SparkEntry.all.size == 253,
      s"registry has ${SparkEntry.all.size} entries, expected 253 — " +
        "if entries were added, bump this pin; if it SHRANK, a tier was lost")
  }

  private val skip = Set(
    // CdcQueries: state mutators
    "i2_asset_cdc", "i3_tombstones", "i4_state_memo", "i6_index_incremental",
    "k1_merge_upsert", "k2_merge_delete", "k3_partitioned_merge", "k9_time_travel",
    "k13_sql_merge", "k14_sql_dml", "k15_sql_ddl", "k16_sql_catalog",
    // SinkQueries: file/sink materializers
    "e2e_silver_gold", "e2e_silver_pdf", "gold_star_oracle", "s1_multiline_json", "s8_sql_dump",
    "s9_json_reference", "k4_full_refresh", "s10_orc_roundtrip", "s11_csv_scan",
    "s12_corrupt_quarantine", "layout_ivf_prune", "k6_search_index",
    "k7_jsonl_export", "k8_saf_export",
    // writes its bucketed catalog tables at plan construction
    "j15_bucketed_join")

  private def canon(name: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // drop memoized artifact builds (HNSW edges, OPQ codebooks) so the
    // build itself re-runs under THIS partition count — reuse would
    // silently shrink what this sweep proves
    graft.queries.PipelineShared.clearMemo()
    try {
      SparkEntry.all.toMap.apply(name)(spark, sf).collect().toSeq.map { r =>
        r.toSeq.map {
          case null => "∅"
          case b: Array[Byte] => java.util.Arrays.toString(b)
          case x => x.toString
        }.mkString("|")
      }.sorted
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  SparkEntry.all.foreach { case (name, _) =>
    if (!skip(name)) {
      test(s"$name is shuffle-partitioning-independent (4 vs 13)") {
        val a = canon(name, 4)
        val b = canon(name, 13)
        val onlyA = a.diff(b).take(3)
        val onlyB = b.diff(a).take(3)
        assert(a == b,
          s"$name drifted across partition counts: ${a.size} vs ${b.size} rows; " +
            s"only@4=$onlyA only@13=$onlyB")
      }
    }
  }
}
