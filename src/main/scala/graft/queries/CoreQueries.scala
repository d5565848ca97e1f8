package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator battery — one named query per operator row of
  * SURVEY.md §2 (P/J/A/W/O/U/G plus the native-function battery), each with
  * a DuckDB oracle in [[CoreQueries.oracles]]. Query shapes mirror the
  * reference's usage (file:line cited per query) re-expressed over the
  * driver testdata tables.
  *
  * Determinism rules (driver hash-compares vs DuckDB):
  *  - every query ends in a total ORDER BY;
  *  - float aggregates are rounded (inputs are 2-decimal-ish, FP
  *    association error ~1e-10 ≪ rounding grain);
  *  - event timestamps are truncated to ms before comparisons (parquet
  *    stores ns; Spark reads µs).
  *
  * Scale notes are per query: filters push to the parquet scan, small
  * dims broadcast, aggregations are partial-agg friendly.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- P: projections/filters

  /** P1 — column-pruning select (transformer.py:1560-1586). Projection +
    * pushed filter; scan should read 4 columns only. */
  private val p1Project: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .filter(col("l_orderkey") % 7 === 0)
      .orderBy("l_orderkey", "l_linenumber")

  /** P2 — null-safe predicate filter + diagnostics agg
    * (transformer.py:1601, gold_analytics.py:397). */
  private val p2NullFilter: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("value").isNotNull && col("props").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")

  /** P3+J1+I1 — compound change predicate over a left join: new vs
    * existing snapshot, keep new/newer/fingerprint-changed rows
    * (transformer.py:1519-1558). Existing snapshot is derived
    * deterministically: keys %4==1 missing (new), fingerprint drifted for
    * keys %5==0 (changed). */
  private val p3ChangePredicate: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val newDf = orders.select(
      col("o_orderkey"),
      col("o_orderdate").as("ts"),
      sha2(concat_ws("||", col("o_orderstatus"), col("o_orderpriority")), 256).as("fp"))
    val existing = orders
      .filter(col("o_orderkey") % 4 =!= 1)
      .select(
        col("o_orderkey"),
        col("o_orderdate").as("ex_ts"),
        sha2(concat_ws("||", col("o_orderstatus"),
          when(col("o_orderkey") % 5 === 0, lit("STALE"))
            .otherwise(col("o_orderpriority"))), 256).as("ex_fp"))
    newDf.join(existing, Seq("o_orderkey"), "left")
      .withColumn("change_kind",
        when(col("ex_fp").isNull, lit("new"))
          .when(coalesce(col("ts"), lit("1970-01-01").cast("timestamp")) >
                coalesce(col("ex_ts"), lit("1970-01-01").cast("timestamp")), lit("newer"))
          .when(col("fp") =!= col("ex_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_kind") =!= "unchanged")
      .groupBy("change_kind").agg(count(lit(1)).as("n"))
      .orderBy("change_kind")
  }

  /** P5 — tier/isin filter (elasticsearch_sync.py:182-183). */
  private val p5IsinFilter: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  /** P6+W2 — state-lookup top-1 by orderBy desc_nulls_last + limit
    * (transformer.py:1339-1346). */
  private val p6StateTop1: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value_r"))
      .orderBy(col("value_r").desc_nulls_last, col("event_id").asc)
      .limit(1)

  // ---------------------------------------------------------------- J: joins

  /** J4+I3 — left-anti deleted-key detection (transformer.py:1705). */
  private val j4LeftAnti: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J6 — dim lookup left join (gold_analytics.py:234-239). */
  private val j6DimLookup: Q = (s, d) =>
    Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** J7 — inner + left chain (gold_analytics.py:542-554). */
  private val j7JoinChain: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
      .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("segment")

  /** J8 — inner surrogate-key resolve (gold_analytics.py:575-579). */
  private val j8KeyResolve: Q = (s, d) =>
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"), "inner")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")

  /** J9 — date-dim validation left join on int date keys
    * (gold_analytics.py:588-592). */
  private val j9DateDimValidate: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val dimDate = orders.select(to_date(col("o_orderdate")).as("dt")).distinct()
      .filter(year(col("dt")) >= 1996) // dim deliberately missing 1995 dates
      .select((year(col("dt")) * 10000 + month(col("dt")) * 100 + dayofmonth(col("dt"))).as("date_key"))
    val fact = orders.select(
      col("o_orderkey"),
      (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
        dayofmonth(col("o_orderdate"))).as("date_key"))
    fact.join(dimDate.withColumn("dim_ok", lit(1)), Seq("date_key"), "left")
      .agg(
        count(lit(1)).as("n_fact"),
        sum(when(col("dim_ok").isNull, 1).otherwise(0)).as("n_unmatched"))
      .select(col("n_fact"), col("n_unmatched"))
  }

  /** J10 — left join on expression equality with coalesce default
    * (gold_analytics.py:631-642). */
  private val j10ExprJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val dim = cust.select(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
      .distinct()
      .withColumn("segment_key", upper(substring(col("segment"), 1, 3)))
    // dim is |segments|-sized — broadcast pins BHJ so the fact side never
    // shuffles for this join (r3 plan let it SMJ at 3.5s)
    cust.join(broadcast(dim), coalesce(col("c_mktsegment"), lit("unknown")) === dim("segment"), "left")
      .groupBy("segment_key").agg(count(lit(1)).as("n_customers"))
      .orderBy("segment_key")
  }

  /** J11 — left join attaching per-key aggregates
    * (gold_analytics.py:455-490). */
  private val j11AggAttach: Q = (s, d) => {
    val counts = Tables.orders(s, d).groupBy("o_custkey")
      .agg(countDistinct("o_orderkey").as("n_orders"),
        round(sum("o_totalprice"), 2).as("lifetime_value"))
    Tables.customer(s, d)
      .join(counts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("lifetime_value"), lit(0.0)).as("lifetime_value"))
      .orderBy("c_custkey")
  }

  /** J12 — bridge integrity: distinct pair table joined inner to both
    * ends (gold_analytics.py:737-763). */
  private val j12BridgeIntegrity: Q = (s, d) => {
    val bridge = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey").distinct()
    bridge
      .join(Tables.orders(s, d).select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "inner")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"), "inner")
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_bridge_rows"))
      .orderBy("s_nationkey")
  }

  /** J13 — broadcast-hinted dim join (elasticsearch_sync.py:185-202).
    * Same result as a plain join; the hint pins the physical strategy —
    * at 100 TB the fact side never shuffles for this join. */
  private val j13BroadcastJoin: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_size") < 10)),
        col("l_partkey") === col("p_partkey"), "inner")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("total_qty"))
      .orderBy("p_brand")

  /** J14 — multi-way star join (dspace_sync.py:380-423,
    * saf_exporter.py:217-257): fact ⨝ 4 dims, revenue rollup. */
  private val j14StarJoin: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "order_year")

  // ---------------------------------------------------------------- A: aggregations

  /** A1 — countDistinct + max per key (gold_analytics.py:456-462). */
  private val a1CountDistinctMax: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(countDistinct("o_orderkey").as("n_orders"),
        max(to_date(col("o_orderdate"))).as("last_order_date"))
      .orderBy("o_custkey")

  /** A2 — per-key distinct count (gold_analytics.py:537-539). */
  private val a2PerKeyDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(countDistinct("l_orderkey").as("n_orders"))
      .orderBy("l_suppkey")

  /** A3 — conditional aggregation + coverage percent
    * (gold_analytics.py:557-567): per nation, share of customers that
    * placed at least one order. */
  private val a3CoveragePct: Q = (s, d) => {
    val hasOrders = Tables.orders(s, d).select("o_custkey").distinct()
      .withColumn("has_orders", lit(1))
    Tables.customer(s, d)
      .join(hasOrders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("total_customers"),
        sum(when(col("has_orders").isNotNull, 1).otherwise(0)).as("covered_customers"))
      // basis points via floor — engine-independent for exact rationals,
      // unlike round-half on the .005 grid
      .withColumn("coverage_bp",
        floor(col("covered_customers") / col("total_customers") * 10000).cast("long"))
      .orderBy("c_nationkey")
  }

  /** A4 — groupBy.count diagnostics (gold_analytics.py:199-203). */
  private val a4SourceCounts: Q = (s, d) =>
    Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n")).orderBy("source")

  /** A5 — collect_list(struct(...)) re-aggregation (saf_exporter.py:217-233).
    * The list is built as an array of (key, name) structs, sorted, then
    * serialized to one string column — the driver's pandas compare can't
    * hash array cells (r02 failure), so the array stays internal. */
  private val a5CollectList: Q = (s, d) =>
    Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"), "inner")
      .groupBy("r_name")
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("n_nationkey"), col("n_name")))),
          // coalesce: Spark's concat_ws skips NULL fields ("key:") while the
          // oracle's || yields NULL and string_agg drops the element — pin
          // both engines to ':'-joined empty string (ADVICE r3)
          m => concat_ws(":", m.getField("n_nationkey"),
            coalesce(m.getField("n_name"), lit("")))),
        "|").as("nations"))
      .orderBy("r_name")

  /** A7 — distinct / dropDuplicates (transformer.py:1653,2023). */
  private val a7Distinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- W: windows

  /** W1 — latest-record-wins dedup via row_number over desc window
    * (transformer.py:1508-1514). Timestamps truncated to ms: parquet
    * stores ns which Spark reads as µs — ms is exact in both engines. */
  private val w1LatestWins: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(date_trunc("millisecond", col("ts")).desc_nulls_last, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- O: sort/limit

  /** O1+O2 — global composite order + limit (gold_analytics.py:605,723). */
  private val o1OrderLimit: Q = (s, d) =>
    Tables.part(s, d)
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(100)

  // ---------------------------------------------------------------- U: set ops

  /** U1+S7 — dim_date domain: union of date projections + fixed fallback
    * row, distinct, calendar attributes (gold_analytics.py:389-416). */
  private val u1DimDate: Q = (s, d) => {
    val o = Tables.orders(s, d).select(to_date(col("o_orderdate")).as("dt"))
    val l = Tables.lineitem(s, d).select(to_date(col("l_shipdate")).as("dt"))
    val fallback = s.range(1).select(lit("2024-01-01").cast("date").as("dt"))
    o.union(l).union(fallback).distinct()
      .filter(col("dt").isNotNull)
      .select(
        (year(col("dt")) * 10000 + month(col("dt")) * 100 + dayofmonth(col("dt"))).as("date_key"),
        col("dt").as("full_date"),
        year(col("dt")).as("year"),
        quarter(col("dt")).as("quarter"),
        month(col("dt")).as("month"),
        dayofmonth(col("dt")).as("day_of_month"),
        dayofweek(col("dt")).as("day_of_week"),
        weekofyear(col("dt")).as("week_of_year"),
        date_format(col("dt"), "MMMM").as("month_name"),
        date_format(col("dt"), "EEEE").as("day_name"))
      .orderBy("date_key")
  }

  /** U2 — unionByName of differently-ordered projections
    * (transformer.py:2544). */
  private val u2UnionByName: Q = (s, d) => {
    val a = Tables.orders(s, d)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("amount"),
        lit("orders").as("src"))
    val b = Tables.lineitem(s, d)
      .select(lit("lineitem").as("src"), col("l_extendedprice").as("amount"),
        col("l_orderkey").as("key"))
    a.unionByName(b)
      .groupBy("src")
      .agg(count(lit(1)).as("n"), round(sum("amount"), 2).as("total_amount"))
      .orderBy("src")
  }

  /** A9 — ROLLUP hierarchy aggregate: (priority, status) → priority
    * subtotals → grand total in ONE pass (Catalyst expands the grouping
    * sets inside a single shuffle — three separate groupBys would scan
    * three times). Group columns are coalesced to '(all)' sentinels and
    * disambiguated by grouping_id, matching DuckDB's ROLLUP. Revenue is
    * fixed-pointed to cents PER ROW, so subtotal sums are exact LONGs
    * at every level. */
  private val a9Rollup: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"))
      .select(col("gid"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("n_orders"), col("revenue_cents"))
      .orderBy("gid", "priority", "status")

  /** A13 — CUBE grouping sets: all four (priority × status) subtotal
    * combinations in ONE aggregate pass (the expand-then-partial-agg
    * plan — the data is read once however many grouping sets there
    * are). Same disambiguation discipline as the rollup: grouping_id
    * separates "NULL because subtotal" from a genuine NULL value. */
  private val a13Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"))
      .select(col("gid"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("n_orders"), col("revenue_cents"))
      .orderBy("gid", "priority", "status")

  /** A10 — pivot (crosstab): order status × priority revenue matrix.
    * The pivot value list is EXPLICIT, so the plan is a single
    * aggregate with one conditional-sum column per priority — no
    * second collect-distinct pass over the data (`pivot(col)` without
    * values does one) and no shuffle beyond the groupBy. */
  private val a10Pivot: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("pr", concat(lit("p"), substring(col("o_orderpriority"), 1, 1)))
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .groupBy("o_orderstatus")
      .pivot("pr", Seq("p1", "p2", "p3", "p4", "p5"))
      .agg(sum("cents"))
      .orderBy("o_orderstatus")

  /** W3 — running (cumulative) total per customer in order-date order:
    * the frame-based window analytic (rows unbounded-preceding..current)
    * beyond W1/W2's ranking forms. Cents are fixed-pointed per row so
    * the running LONG sum is exact at any prefix; (date, orderkey)
    * makes the ordering total and the result deterministic. Shuffle key
    * = o_custkey, the same key the batch aggregates use. */
  private val w3RunningTotal: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum("cents").over(w).as("running_cents"),
        row_number().over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey")))
          .as("order_seq"))
      .orderBy("o_custkey", "order_seq")
  }

  /** W4 — ntile + lag: orders ranked into revenue quartiles with the
    * per-rank step (cents - lag(cents)) accumulated per tile. A naive
    * `Window.orderBy` with no partition spec sorts EVERYTHING in one
    * task — the classic 100 TB killer — so the global rank is computed
    * distributed: range-repartition on the sort key (every partition
    * holds a contiguous rank range), rank + lag locally per partition,
    * then fix up with a per-bin boundary table (≤ `bins` rows —
    * row count → rank offsets, last value → cross-boundary lag)
    * broadcast back. ntile is then pure arithmetic on the global rank
    * (SQL-standard remainder-to-front sizes, matching both engines).
    *
    * The bin id is an explicit PURE FUNCTION of the sort key
    * (width_bucket over a collected min/max — at 100 TB, approxQuantile
    * boundaries give equal-depth bins the same way), NOT
    * `repartitionByRange` + `spark_partition_id`: range sampling is
    * seeded per RDD id, so the boundary job and the main job would see
    * DIFFERENT partitionings (measured — off-by-dozens rank drift).
    * Two extra tiny jobs (min/max + boundary collect) buy a plan with
    * no single-task sort. All integer arithmetic. */
  private val w4NtileLag: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val bins = 32
    val o = Tables.orders(s, d)
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .select("o_orderkey", "cents")
      // ntile ranks VALUES: null prices have no rank position — and a
      // null bin/last_cents would poison the boundary fix-up rows
      .filter(col("cents").isNotNull)
    val scale = o.agg(min("cents"), max("cents")).head()
    // zero-row input: min/max are NULL; any bounds work (binned is
    // empty), but the primitive getters would NPE
    val (minC, maxC) =
      if (scale.isNullAt(0)) (0L, 0L) else (scale.getLong(0), scale.getLong(1))
    // monotone in cents ⇒ each bin is a contiguous slice of the global
    // (cents desc, orderkey) order, and equal cents never straddle bins
    val binned = o.withColumn("bin",
      least(lit(bins.toLong), greatest(lit(1L),
        width_bucket(col("cents"), lit(minC.toDouble), lit(maxC.toDouble + 1), lit(bins))))
        .cast("int"))
    val w = Window.partitionBy("bin").orderBy(col("cents").desc, col("o_orderkey"))
    val local = binned
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_cents", lag("cents", 1).over(w))
    // boundary table: one row per non-empty bin, in global (desc) order.
    // Within a bin the sort is (cents desc, orderkey), so the bin's LAST
    // value is exactly min(cents) — computed as a plain map-side-combinable
    // aggregate over `binned`, NOT max_by(cents, rn) over the windowed
    // frame: the latter re-ran the full per-bin sort just to read its last
    // row (measured ~2× on the whole query at sf0.1, the r9 regression).
    val stats = binned.groupBy("bin")
      .agg(count(lit(1)).as("cnt"), min("cents").as("last_cents"))
      .orderBy(col("bin").desc).collect()
    var acc = 0L
    var prevLast: Option[Long] = None
    val meta = stats.toSeq.map { r =>
      val row = (r.getInt(0), acc, prevLast)
      acc += r.getLong(1); prevLast = Some(r.getLong(2))
      row
    }
    val n = acc
    val base = n / 4
    val rem = n % 4
    val headRows = rem * (base + 1)
    import s.implicits._
    val metaDf = meta.toDF("bin", "offset", "prev_last")
    val rank = col("offset") + col("rn")
    val tile = when(rank <= headRows,
        floor((rank - 1) / lit(base + 1)) + 1)
      .otherwise(lit(rem) + floor((rank - 1 - headRows) / lit(math.max(base, 1L))) + 1)
    local.join(broadcast(metaDf), Seq("bin"))
      .select(col("cents"), tile.cast("int").as("tile"),
        // lag across the partition boundary comes from the previous
        // partition's last value; the global first row has neither → 0
        coalesce(col("cents") - coalesce(col("prev_cents"), col("prev_last")), lit(0L))
          .as("step"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n"), sum("cents").as("tile_cents"), sum("step").as("sum_step"))
      .orderBy("tile")
  }

  /** A11 — approximate distinct count (HLL++), the 100 TB profiling
    * tier: mergeable sketch, fixed memory per group, no exact
    * shuffle-the-world countDistinct. The battery entry pins the ERROR
    * CONTRACT, not the sketch internals: the exact count (which DuckDB
    * verifies) plus a boolean |approx−exact|/exact ≤ 3·rsd that the
    * oracle asserts as a literal `true`. The estimate itself is
    * deterministic (HLL++ is), so the hash is stable. */
  private val a11ApproxDistinct: Q = (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_n"),
        approx_count_distinct("user_id", rsd = 0.02).as("approx_n"))
      .select(col("event_type"), col("exact_n"),
        (abs(col("approx_n") - col("exact_n")) <= col("exact_n") * 0.06)
          .as("within_bound"))
      .orderBy("event_type")

  /** A12 — approximate quantiles (Greenwald-Khanna via
    * percentile_approx, ε = 1/accuracy rank error): the sketch answers
    * with an element whose RANK is within ε of the target, so the
    * contract check re-ranks each estimate with conditional counts and
    * asserts |rank − p| ≤ 2ε. Two passes total (sketch, then rank
    * audit) — both full map-side-combinable aggregates, no sort. */
  private val a12ApproxQuantile: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val probs = Seq(0.25, 0.5, 0.75)
    val accuracy = 100 // ε = 0.01 rank error
    val estRow = orders.agg(percentile_approx(col("o_totalprice"),
        array(probs.map(lit): _*), lit(accuracy)).as("aq"))
      .head()
    // zero-row input: the sketch returns NULL (not an empty array) and
    // the rank audit's count() is 0 — guard both (estimates default to
    // 0, the divisor to 1) so the result degrades to a 0-row-count row
    // with NULL check booleans instead of an NPE / ANSI divide-by-zero
    val est = if (estRow.isNullAt(0)) probs.map(_ => 0.0) else estRow.getSeq[Double](0)
    val rankChecks = probs.zip(est).map { case (p, q) =>
      (abs(sum(when(col("o_totalprice") <= q, 1L).otherwise(0L))
        / greatest(count(lit(1)), lit(1L)) - p)
        <= 0.02).as(s"q${(p * 100).toInt}_ok")
    }
    orders.agg(count(lit(1)).as("n_rows"), rankChecks: _*)
  }

  // ---------------------------------------------------------------- G: generators

  /** G1 — posexplode with ordinal semantics (transformer.py:1598-1605).
    * Verified through aggregate identities (count, 1-based position sum,
    * first token) the oracle computes without unnest. */
  private val g1PosexplodeTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("pos") + 1).as("sum_pos1"),
        max(when(col("pos") === 0, col("token"))).as("first_token"))
      .orderBy("doc_id")

  /** G2 — explode of array-of-struct + struct field access
    * (gold_analytics.py:528-534). */
  private val g2ExplodeStruct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(explode(array(
        struct(lit(1).as("measure_id"), col("l_quantity").as("val")),
        struct(lit(2).as("measure_id"), col("l_extendedprice").as("val")))).as("m"))
      .select(col("m.measure_id").as("measure_id"), col("m.val").as("val"))
      .groupBy("measure_id")
      .agg(round(sum("val"), 2).as("total"))
      .orderBy("measure_id")

  // ---------------------------------------------------------------- F: native function battery

  /** sha2 uid derivation (transformer.py:1608) + filename/extension
    * extraction battery (transformer.py:1606-1607). */
  private val fUidFilename: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("asset_path",
        concat(lit("/bronze/"), col("source"), lit("/pdfs/doc_"), col("doc_id"), lit(".pdf")))
      .select(
        col("doc_id"),
        sha2(concat_ws("||", col("doc_id"), col("source"), col("lang")), 256).as("asset_uid"),
        element_at(split(col("asset_path"), "/"), -1).as("file_name"),
        regexp_extract(lower(element_at(split(col("asset_path"), "/"), -1)),
          "\\.([a-z0-9]+)$", 1).as("file_ext"))
      .orderBy("doc_id")

  /** when/otherwise repair chain + score renormalization
    * (gold_analytics.py:437-444,714-720). */
  private val fWhenRepair: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("publisher",
        when(col("lang") === "en", lit("English Press"))
          .when(col("lang") === "vi", lit("NXB Vietnam"))
          .otherwise(concat(lit("Intl-"), upper(col("lang")))))
      .withColumn("quality_score", round(least(lit(1.0), col("n_chars") / lit(500.0)), 3))
      .groupBy("publisher")
      .agg(count(lit(1)).as("n"), round(avg("quality_score"), 3).as("avg_quality"))
      .orderBy("publisher")

  // ---------------------------------------------------------------- S: sources

  /** S5 — local-collection source with explicit schema joined to a table
    * (transformer.py:1358-1361,2114-2123). */
  private val s5LocalCollection: Q = (s, d) => {
    import s.implicits._
    val localized = Seq(
      (0, "Africa (localized)"), (1, "America (localized)"),
      (2, "Asia (localized)"), (3, "Europe (localized)"), (4, "Middle East (localized)"))
      .toDF("key", "localized_name")
    Tables.region(s, d)
      .join(localized, col("r_regionkey") === col("key"), "left")
      .select(col("r_regionkey"), col("r_name"), col("localized_name"))
      .orderBy("r_regionkey")
  }

  /** S4 — raw parquet scan with a path glob filter
    * (saf_exporter.py:192-211). */
  private val s4GlobScan: Q = (s, d) =>
    s.read.option("pathGlobFilter", "lineitem.parquet").parquet(d)
      .agg(count(lit(1)).as("n_rows"), countDistinct("l_orderkey").as("n_orders"))

  // ---------------------------------------------------------------- registry

  val queries: Seq[(String, Q)] = RelationalExtrasQueries.queries ++ Seq(
    "p1_project_prune" -> p1Project,
    "p2_null_filter" -> p2NullFilter,
    "p3_change_predicate" -> p3ChangePredicate,
    "p5_isin_filter" -> p5IsinFilter,
    "p6_state_top1" -> p6StateTop1,
    "j4_left_anti" -> j4LeftAnti,
    "j6_dim_lookup" -> j6DimLookup,
    "j7_join_chain" -> j7JoinChain,
    "j8_key_resolve" -> j8KeyResolve,
    "j9_date_dim_validate" -> j9DateDimValidate,
    "j10_expr_join" -> j10ExprJoin,
    "j11_agg_attach" -> j11AggAttach,
    "j12_bridge_integrity" -> j12BridgeIntegrity,
    "j13_broadcast_join" -> j13BroadcastJoin,
    "j14_star_join" -> j14StarJoin,
    "a1_countdistinct_max" -> a1CountDistinctMax,
    "a2_perkey_distinct" -> a2PerKeyDistinct,
    "a3_coverage_pct" -> a3CoveragePct,
    "a4_source_counts" -> a4SourceCounts,
    "a5_collect_list" -> a5CollectList,
    "a7_distinct" -> a7Distinct,
    "a9_rollup" -> a9Rollup,
    "a13_cube" -> a13Cube,
    "a10_pivot" -> a10Pivot,
    "a11_approx_distinct" -> a11ApproxDistinct,
    "a12_approx_quantile" -> a12ApproxQuantile,
    "w1_latest_wins" -> w1LatestWins,
    "w3_running_total" -> w3RunningTotal,
    "w4_ntile_lag" -> w4NtileLag,
    "o1_order_limit" -> o1OrderLimit,
    "u1_dim_date" -> u1DimDate,
    "u2_union_by_name" -> u2UnionByName,
    "g1_posexplode_tokens" -> g1PosexplodeTokens,
    "g2_explode_struct" -> g2ExplodeStruct,
    "f_uid_filename" -> fUidFilename,
    "f_when_repair" -> fWhenRepair,
    "s5_local_collection" -> s5LocalCollection,
    "s4_glob_scan" -> s4GlobScan,
  )

  val oracles: Map[String, String] = RelationalExtrasQueries.oracles ++ Map(
    "a9_rollup" ->
      """SELECT CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  coalesce(o_orderstatus, '(all)') AS status,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY gid, priority, status""".stripMargin,
    "a13_cube" ->
      """SELECT CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  coalesce(o_orderstatus, '(all)') AS status,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, priority, status""".stripMargin,
    "a10_pivot" ->
      """WITH o AS (
        |  SELECT o_orderstatus, 'p' || substr(o_orderpriority, 1, 1) AS pr,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderstatus,
        |  CAST(sum(cents) FILTER (WHERE pr = 'p1') AS BIGINT) AS p1,
        |  CAST(sum(cents) FILTER (WHERE pr = 'p2') AS BIGINT) AS p2,
        |  CAST(sum(cents) FILTER (WHERE pr = 'p3') AS BIGINT) AS p3,
        |  CAST(sum(cents) FILTER (WHERE pr = 'p4') AS BIGINT) AS p4,
        |  CAST(sum(cents) FILTER (WHERE pr = 'p5') AS BIGINT) AS p5
        |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w3_running_total" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running_cents,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
        |FROM o ORDER BY o_custkey, order_seq""".stripMargin,
    "w4_ntile_lag" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT o_orderkey, cents,
        |    ntile(4) OVER (ORDER BY cents DESC, o_orderkey) AS tile,
        |    coalesce(cents - lag(cents, 1) OVER (ORDER BY cents DESC, o_orderkey),
        |      0) AS step
        |  FROM o)
        |SELECT CAST(tile AS INT) AS tile, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS tile_cents,
        |  CAST(sum(step) AS BIGINT) AS sum_step
        |FROM r GROUP BY tile ORDER BY tile""".stripMargin,
    "a11_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n,
        |  true AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a12_approx_quantile" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS q25_ok, true AS q50_ok, true AS q75_ok
        |FROM orders""".stripMargin,
    "p1_project_prune" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p2_null_filter" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events WHERE value IS NOT NULL AND props IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "p3_change_predicate" ->
      """WITH newdf AS (
        |  SELECT o_orderkey, o_orderdate AS ts,
        |    sha256(concat_ws('||', o_orderstatus, o_orderpriority)) AS fp
        |  FROM orders),
        |existing AS (
        |  SELECT o_orderkey, o_orderdate AS ex_ts,
        |    sha256(concat_ws('||', o_orderstatus,
        |      CASE WHEN o_orderkey % 5 = 0 THEN 'STALE' ELSE o_orderpriority END)) AS ex_fp
        |  FROM orders WHERE o_orderkey % 4 <> 1),
        |joined AS (
        |  SELECT CASE
        |    WHEN e.ex_fp IS NULL THEN 'new'
        |    WHEN coalesce(n.ts, TIMESTAMP '1970-01-01') > coalesce(e.ex_ts, TIMESTAMP '1970-01-01') THEN 'newer'
        |    WHEN n.fp <> e.ex_fp THEN 'changed'
        |    ELSE 'unchanged' END AS change_kind
        |  FROM newdf n LEFT JOIN existing e USING (o_orderkey))
        |SELECT change_kind, CAST(count(*) AS BIGINT) AS n
        |FROM joined WHERE change_kind <> 'unchanged'
        |GROUP BY change_kind ORDER BY change_kind""".stripMargin,
    "p5_isin_filter" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "p6_state_top1" ->
      """SELECT event_id, event_type, round(value, 2) AS value_r
        |FROM events ORDER BY value_r DESC NULLS LAST, event_id ASC LIMIT 1""".stripMargin,
    "j4_left_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j6_dim_lookup" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "j7_join_chain" ->
      """SELECT coalesce(c_mktsegment, 'unknown') AS segment,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,
    "j8_key_resolve" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "j9_date_dim_validate" ->
      """WITH dim_date AS (
        |  SELECT DISTINCT year(o_orderdate) * 10000 + month(o_orderdate) * 100
        |    + dayofmonth(o_orderdate) AS date_key
        |  FROM orders WHERE year(o_orderdate) >= 1996),
        |fact AS (
        |  SELECT o_orderkey, year(o_orderdate) * 10000 + month(o_orderdate) * 100
        |    + dayofmonth(o_orderdate) AS date_key
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n_fact,
        |  CAST(sum(CASE WHEN d.date_key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM fact f LEFT JOIN dim_date d ON f.date_key = d.date_key""".stripMargin,
    "j10_expr_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT coalesce(c_mktsegment, 'unknown') AS segment,
        |    upper(substring(coalesce(c_mktsegment, 'unknown'), 1, 3)) AS segment_key
        |  FROM customer)
        |SELECT segment_key, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer LEFT JOIN dim ON coalesce(c_mktsegment, 'unknown') = dim.segment
        |GROUP BY segment_key ORDER BY segment_key""".stripMargin,
    "j11_agg_attach" ->
      """WITH counts AS (
        |  SELECT o_custkey, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |    round(sum(o_totalprice), 2) AS lifetime_value
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, coalesce(n_orders, 0) AS n_orders,
        |  coalesce(lifetime_value, 0.0) AS lifetime_value
        |FROM customer LEFT JOIN counts ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "j12_bridge_integrity" ->
      """WITH bridge AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_bridge_rows
        |FROM bridge
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "j13_broadcast_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 10
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j14_star_join" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INT) AS order_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, order_year ORDER BY r_name, order_year""".stripMargin,
    "a1_countdistinct_max" ->
      """SELECT o_custkey, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(max(o_orderdate) AS DATE) AS last_order_date
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a2_perkey_distinct" ->
      """SELECT l_suppkey, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "a3_coverage_pct" ->
      """WITH has_orders AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS total_customers,
        |  CAST(sum(CASE WHEN h.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered_customers,
        |  CAST(floor(CAST(sum(CASE WHEN h.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 10000) AS BIGINT) AS coverage_bp
        |FROM customer LEFT JOIN has_orders h ON c_custkey = h.o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a4_source_counts" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "a5_collect_list" ->
      """SELECT r_name,
        |  string_agg(CAST(n_nationkey AS VARCHAR) || ':' || coalesce(n_name, ''), '|'
        |    ORDER BY n_nationkey, n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "a7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "w1_latest_wins" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('milliseconds', ts) DESC NULLS LAST, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type FROM ranked WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "o1_order_limit" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 100""".stripMargin,
    "u1_dim_date" ->
      """WITH dates AS (
        |  SELECT CAST(o_orderdate AS DATE) AS dt FROM orders
        |  UNION
        |  SELECT CAST(l_shipdate AS DATE) AS dt FROM lineitem
        |  UNION
        |  SELECT DATE '2024-01-01' AS dt)
        |SELECT CAST(year(dt) * 10000 + month(dt) * 100 + dayofmonth(dt) AS INT) AS date_key,
        |  dt AS full_date,
        |  CAST(year(dt) AS INT) AS year, CAST(quarter(dt) AS INT) AS quarter,
        |  CAST(month(dt) AS INT) AS month, CAST(dayofmonth(dt) AS INT) AS day_of_month,
        |  CAST(dayofweek(dt) + 1 AS INT) AS day_of_week,
        |  CAST(weekofyear(dt) AS INT) AS week_of_year,
        |  monthname(dt) AS month_name, dayname(dt) AS day_name
        |FROM dates WHERE dt IS NOT NULL ORDER BY date_key""".stripMargin,
    "u2_union_by_name" ->
      """WITH unioned AS (
        |  SELECT o_orderkey AS key, o_totalprice AS amount, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT l_orderkey AS key, l_extendedprice AS amount, 'lineitem' AS src FROM lineitem)
        |SELECT src, CAST(count(*) AS BIGINT) AS n, round(sum(amount), 2) AS total_amount
        |FROM unioned GROUP BY src ORDER BY src""".stripMargin,
    "g1_posexplode_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split(text, ' ')) * (len(string_split(text, ' ')) + 1) / 2
        |    AS BIGINT) AS sum_pos1,
        |  string_split(text, ' ')[1] AS first_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "g2_explode_struct" ->
      """SELECT 1 AS measure_id, round(sum(l_quantity), 2) AS total FROM lineitem
        |UNION ALL
        |SELECT 2 AS measure_id, round(sum(l_extendedprice), 2) AS total FROM lineitem
        |ORDER BY measure_id""".stripMargin,
    "f_uid_filename" ->
      """SELECT doc_id,
        |  sha256(concat_ws('||', CAST(doc_id AS VARCHAR), source, lang)) AS asset_uid,
        |  'doc_' || CAST(doc_id AS VARCHAR) || '.pdf' AS file_name,
        |  regexp_extract(lower('doc_' || CAST(doc_id AS VARCHAR) || '.pdf'),
        |    '\.([a-z0-9]+)$', 1) AS file_ext
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f_when_repair" ->
      """SELECT CASE WHEN lang = 'en' THEN 'English Press'
        |  WHEN lang = 'vi' THEN 'NXB Vietnam'
        |  ELSE 'Intl-' || upper(lang) END AS publisher,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(round(least(1.0, n_chars / 500.0), 3)), 3) AS avg_quality
        |FROM documents GROUP BY publisher ORDER BY publisher""".stripMargin,
    "s5_local_collection" ->
      """SELECT r_regionkey, r_name, localized_name
        |FROM region LEFT JOIN (VALUES
        |  (0, 'Africa (localized)'), (1, 'America (localized)'),
        |  (2, 'Asia (localized)'), (3, 'Europe (localized)'),
        |  (4, 'Middle East (localized)')) AS t(key, localized_name)
        |ON r_regionkey = key ORDER BY r_regionkey""".stripMargin,
    "s4_glob_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem""".stripMargin,
  )
}
