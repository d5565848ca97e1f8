package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TableMerge

/** STREAMING twins of the r15 event-analytics tier (`evt_funnel` /
  * `evt_retention`) — the last maintained artifacts in the repo that
  * had no stream==batch proof. Both fold per-user SUFFICIENT STATS into
  * a bucketed TableMerge state table (the [[EventStreams.upsertLatestSink]]
  * O(batch) discipline: touched buckets read, untouched buckets
  * hard-linked), and both folds are MIN/SET-UNION monoids — commutative,
  * associative, IDEMPOTENT — so out-of-order delivery and at-least-once
  * replay are correct BY ALGEBRA, with no batch-tag protocol to get
  * wrong (contrast [[CmsStream]], whose counter addition needs one).
  *
  * FUNNEL state per user: t1 = min view time (a min-fold), plus the
  * click/purchase candidate SETS that can still matter for t2/t3. The
  * pruning rule rides on t1 only ever DECREASING as late data arrives:
  * the step windows (t1, t1+24h] and (t2 ≤ t1+24h, t2+24h] only ever
  * move EARLIER, so a click > t1+24h (purchase > t1+48h) can never
  * re-enter and is dropped for good, while everything at or below the
  * horizon is retained because a future, earlier first-view could make
  * it the step event. t2/t3 are DERIVED at read time from the retained
  * sets — deriving (not storing) them is what makes the fold
  * order-independent. Retained-set size: for a user WITH a view, it is
  * bounded by their real activity inside a ~24/48 h horizon of the
  * first view (the same per-user-behavior bound sessionization
  * carries). A user who clicks/purchases but NEVER views keeps every
  * candidate (t1 IS NULL admits all — any future earlier view could
  * make them eligible), so the exact fold is unbounded for that class;
  * a production deployment bounds it with a watermark contract (views
  * arrive within L of their event time ⇒ candidates older than
  * max-seen-event-time − L − 24h for a still-viewless user can never
  * become step events and may drop), trading exactness on
  * pathologically late views for bounded state — the same trade every
  * watermarked streaming aggregate makes. The battery keeps the exact
  * fold because its stream==batch equality proof needs it.
  *
  * RETENTION state per user: cohort_day = min active day (min-fold) +
  * the active-day set within [cohort_day, cohort_day+14] — at most 15
  * distinct days by construction, and when a late earlier event lowers
  * cohort_day, days only ever EXIT the window (offsets grow), so the
  * prune is monotone too.
  *
  * Scale posture: per micro-batch, one per-user partial aggregate over
  * the BATCH, a touched-bucket-pruned read of the state table, and a
  * partition-scoped upsert — O(batch + state-in-touched-buckets). The
  * report is one bounded aggregate over per-user rows (O(users), the
  * same cardinality the batch query's per-user aggregates carry).
  */
object FunnelStream {

  /** 24-hour step window in µs — must match EventAnalyticsQueries. */
  private[graft] val StepUs = 86400000000L

  private def bucketed(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(hash(col("user_id")), lit(nBuckets)))

  private def touchedBuckets(bucketedBatch: DataFrame): Seq[Int] =
    bucketedBatch.select("bucket").distinct().collect().map(_.getInt(0)).toSeq

  /** Old state restricted to the batch's buckets (static isin pruning
    * at the parquet scan), or None on bootstrap. */
  private def touchedState(s: SparkSession, tablePath: String,
                           touched: Seq[Int]): Option[DataFrame] =
    if (TableMerge.exists(tablePath))
      Some(TableMerge.read(s, tablePath).filter(col("bucket").isin(touched: _*)))
    else None

  // ------------------------------------------------------------ funnel

  /** Per-user partial state of one batch of (user_id, event_type, tus).
    * Pruned against the BATCH-LOCAL horizon already: the batch's min
    * view is an upper bound on the final t1, so the final horizon is at
    * or below this one and nothing ever-eligible is dropped. */
  private def funnelPartial(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("tus"))).as("t1"),
      sort_array(array_distinct(collect_list(
        when(col("event_type") === "click", col("tus"))))).as("clicks"),
      sort_array(array_distinct(collect_list(
        when(col("event_type") === "purchase", col("tus"))))).as("purchases"))
      .selectExpr("user_id", "t1",
        s"filter(clicks, c -> t1 IS NULL OR c <= t1 + $StepUs) AS clicks",
        s"filter(purchases, p -> t1 IS NULL OR p <= t1 + ${2 * StepUs}) AS purchases")

  /** The idempotent two-sided fold: min the first-view, union + prune
    * the candidate sets against the merged horizon. */
  private def funnelMerge(old: DataFrame, add: DataFrame): DataFrame = {
    def pre(df: DataFrame, tag: String): DataFrame =
      df.select(col("user_id"), col("t1").as(s"t1_$tag"),
        col("clicks").as(s"c_$tag"), col("purchases").as(s"p_$tag"))
    pre(old, "a").join(pre(add, "b"), Seq("user_id"), "full_outer")
      .withColumn("t1", least(col("t1_a"), col("t1_b")))
      .selectExpr("user_id", "t1",
        // keep a candidate iff it is at or below the horizon; an
        // unknown t1 (no view yet) keeps everything — any click could
        // become eligible once the first view arrives
        s"""sort_array(array_distinct(filter(
           |  concat(coalesce(c_a, CAST(array() AS ARRAY<BIGINT>)),
           |         coalesce(c_b, CAST(array() AS ARRAY<BIGINT>))),
           |  c -> t1 IS NULL OR c <= t1 + $StepUs))) AS clicks""".stripMargin,
        s"""sort_array(array_distinct(filter(
           |  concat(coalesce(p_a, CAST(array() AS ARRAY<BIGINT>)),
           |         coalesce(p_b, CAST(array() AS ARRAY<BIGINT>))),
           |  p -> t1 IS NULL OR p <= t1 + ${2 * StepUs}))) AS purchases""".stripMargin)
  }

  /** The per-micro-batch apply, factored out so the spec can drive
    * replay / out-of-order paths directly. Applying any batch twice is
    * a no-op by idempotence of the fold. */
  private[graft] def applyFunnelBatch(batch: DataFrame, tablePath: String,
                                      nBuckets: Int): Unit =
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      val part = funnelPartial(batch.select("user_id", "event_type", "tus"))
      val b = bucketed(part, nBuckets)
      val touched = touchedBuckets(b)
      val merged = touchedState(s, tablePath, touched) match {
        case Some(st) => funnelMerge(st, part)
        case None => part
      }
      TableMerge.upsert(s, tablePath, bucketed(merged, nBuckets),
        keys = Seq("bucket", "user_id"), partitionCols = Seq("bucket"))
    }

  /** Streaming maintenance of the funnel state table over a stream of
    * (user_id, event_type, tus BIGINT) events. */
  def funnelSink(events: DataFrame, tablePath: String, checkpointDir: String,
                 nBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyFunnelBatch(batch, tablePath, nBuckets)
      }
      .start()

  /** The funnel report off the live state table — IDENTICAL columns and
    * arithmetic to the batch `evt_funnel`, so at any batch boundary the
    * two are row-equal over everything ingested. t2/t3 derive from the
    * retained candidate sets here, at read time. */
  def funnelReport(s: SparkSession, tablePath: String): DataFrame =
    TableMerge.read(s, tablePath)
      .selectExpr("user_id", "t1", "purchases",
        s"array_min(filter(clicks, c -> c > t1 AND c <= t1 + $StepUs)) AS t2")
      .selectExpr("user_id", "t1", "t2",
        s"array_min(filter(purchases, p -> p > t2 AND p <= t2 + $StepUs)) AS t3")
      .agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_viewed"),
        count(col("t2")).as("n_clicked"),
        count(col("t3")).as("n_purchased"),
        coalesce(sum(col("t3") - col("t1")), lit(0L)).as("convert_us_sum"))
      .selectExpr("n_users", "n_viewed", "n_clicked", "n_purchased",
        "CASE WHEN n_viewed = 0 THEN 0 ELSE (n_clicked * 10000) DIV n_viewed END"
          + " AS click_bp",
        "CASE WHEN n_clicked = 0 THEN 0 ELSE (n_purchased * 10000) DIV n_clicked END"
          + " AS purchase_bp",
        "CASE WHEN n_users = 0 THEN 0 ELSE (n_purchased * 10000) DIV n_users END"
          + " AS overall_bp",
        "convert_us_sum")
      .select("n_users", "n_viewed", "n_clicked", "n_purchased",
        "click_bp", "purchase_bp", "overall_bp", "convert_us_sum")

  // --------------------------------------------------------- retention

  /** Per-user partial state of one batch of (user_id, day DATE) —
    * pruned against the batch-local cohort window (an upper bound on
    * the final one, same argument as [[funnelPartial]]). */
  private def retentionPartial(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      min("day").as("cohort_day"),
      sort_array(array_distinct(collect_list(col("day")))).as("days"))
      .selectExpr("user_id", "cohort_day",
        "filter(days, dd -> datediff(dd, cohort_day) <= 14) AS days")

  private def retentionMerge(old: DataFrame, add: DataFrame): DataFrame =
    old.select(col("user_id"), col("cohort_day").as("cd_a"), col("days").as("d_a"))
      .join(add.select(col("user_id"), col("cohort_day").as("cd_b"),
        col("days").as("d_b")), Seq("user_id"), "full_outer")
      .withColumn("cohort_day", least(col("cd_a"), col("cd_b")))
      .selectExpr("user_id", "cohort_day",
        // ≤ 15 distinct days by construction; a lowered cohort_day only
        // shrinks the window, so the prune is monotone
        """sort_array(array_distinct(filter(
          |  concat(coalesce(d_a, CAST(array() AS ARRAY<DATE>)),
          |         coalesce(d_b, CAST(array() AS ARRAY<DATE>))),
          |  dd -> datediff(dd, cohort_day) <= 14))) AS days""".stripMargin)

  private[graft] def applyRetentionBatch(batch: DataFrame, tablePath: String,
                                         nBuckets: Int): Unit =
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      val part = retentionPartial(batch.select("user_id", "day"))
      val b = bucketed(part, nBuckets)
      val touched = touchedBuckets(b)
      val merged = touchedState(s, tablePath, touched) match {
        case Some(st) => retentionMerge(st, part)
        case None => part
      }
      TableMerge.upsert(s, tablePath, bucketed(merged, nBuckets),
        keys = Seq("bucket", "user_id"), partitionCols = Seq("bucket"))
    }

  /** Streaming maintenance of the cohort state table over a stream of
    * (user_id, day DATE) activity. */
  def retentionSink(activity: DataFrame, tablePath: String, checkpointDir: String,
                    nBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    activity.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyRetentionBatch(batch, tablePath, nBuckets)
      }
      .start()

  /** The cohort-retention report off the live state table — identical
    * columns and arithmetic to the batch `evt_retention`. */
  def retentionReport(s: SparkSession, tablePath: String): DataFrame = {
    val st = TableMerge.read(s, tablePath)
    val sizes = st.groupBy("cohort_day")
      .agg(countDistinct("user_id").as("n_cohort"))
    st.select(col("user_id"), col("cohort_day"), explode(col("days")).as("day"))
      .selectExpr("user_id", "cohort_day",
        "CAST(datediff(day, cohort_day) AS BIGINT) AS day_offset")
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_day")
      .selectExpr("cohort_day", "day_offset", "n_active", "n_cohort",
        "(n_active * 10000) DIV n_cohort AS retained_bp")
      .orderBy("cohort_day", "day_offset")
  }
}
