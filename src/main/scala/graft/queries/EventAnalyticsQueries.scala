package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.PipelineShared._

/** Behavioral event analytics — the two classic product-analytics
  * operators every warehouse team asks of an events table and no other
  * registry entry expresses: ordered FUNNEL conversion and COHORT
  * retention. Both are exact-integer relational forms (epoch-µs
  * arithmetic, basis-point divisions), no sessionization dependency.
  */
private[queries] object EventAnalyticsQueries {

  /** ORDERED funnel view → click → purchase with a 24-hour step
    * window: per user, t1 = first view, t2 = first click in
    * (t1, t1+24h], t3 = first purchase in (t2, t2+24h] — the
    * ordered-sequence-within-window semantics (a purchase before any
    * view, or days after the click, does not count) that distinguish
    * a funnel from three independent counts; the window keeps every
    * step selective instead of saturating on a dense corpus. One row out: step populations,
    * step-to-step and overall conversion in basis points, and the
    * exact summed µs view→purchase latency of converters.
    *
    * Scale posture: three per-user partial aggregates chained by
    * user_id equi-joins — each step's frame shrinks (only users who
    * passed the previous step), nothing windows over the event log,
    * and the event scan prunes to (user_id, event_type, ts). */
  /** Step window: the next funnel stage must land within 24 hours. */
  private val StepUs = 86400000000L

  private val evtFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS tus")
    val entered = ev.agg(countDistinct("user_id").as("n_users"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("tus") > col("t1") && col("tus") <= col("t1") + StepUs)
      .groupBy("user_id").agg(min("tus").as("t2"), min("t1").as("t1"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("tus") > col("t2") && col("tus") <= col("t2") + StepUs)
      .groupBy("user_id").agg(min("tus").as("t3"), min("t1").as("t1"))
    entered
      .crossJoin(broadcast(t1.agg(count(lit(1)).as("n_viewed"))))
      .crossJoin(broadcast(t2.agg(count(lit(1)).as("n_clicked"))))
      .crossJoin(broadcast(t3.agg(count(lit(1)).as("n_purchased"),
        coalesce(sum(col("t3") - col("t1")), lit(0L)).as("convert_us_sum"))))
      .selectExpr("n_users", "n_viewed", "n_clicked", "n_purchased",
        "CASE WHEN n_viewed = 0 THEN 0 ELSE (n_clicked * 10000) DIV n_viewed END"
          + " AS click_bp",
        "CASE WHEN n_clicked = 0 THEN 0 ELSE (n_purchased * 10000) DIV n_clicked END"
          + " AS purchase_bp",
        "CASE WHEN n_users = 0 THEN 0 ELSE (n_purchased * 10000) DIV n_users END"
          + " AS overall_bp",
        "convert_us_sum")
  }

  /** COHORT retention: users cohort by their first-seen DAY, and cell
    * (cohort_day, day_offset ≤ 14) counts distinct cohort members
    * active that many days later, with the retained fraction in basis
    * points. Day-0 retention is 10000 by construction — its presence
    * under the hash pins the date arithmetic.
    *
    * Scale posture: one per-user min-date aggregate, one broadcast-
    * size cohort-census join, one (cohort, offset) distinct-count —
    * the O(users + events) shape, never a per-user window. */
  private val evtRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day")
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(countDistinct("user_id").as("n_cohort"))
    ev.join(cohort, "user_id")
      .selectExpr("user_id", "cohort_day",
        "CAST(datediff(day, cohort_day) AS BIGINT) AS day_offset")
      .filter(col("day_offset") <= 14)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_day")
      .selectExpr("cohort_day", "day_offset", "n_active", "n_cohort",
        "(n_active * 10000) DIV n_cohort AS retained_bp")
      .orderBy("cohort_day", "day_offset")
  }

  val queries: Seq[(String, Q)] = Seq(
    "evt_funnel" -> evtFunnel,
    "evt_retention" -> evtRetention,
  )

  val oracles: Map[String, String] = Map(
    "evt_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |t1 AS (
        |  SELECT user_id, min(tus) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.tus) AS t2, min(t1.t1) AS t1
        |  FROM ev e JOIN t1 ON t1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.tus > t1.t1
        |    AND e.tus <= t1.t1 + 86400000000
        |  GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.tus) AS t3, min(t2.t1) AS t1
        |  FROM ev e JOIN t2 ON t2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus > t2.t2
        |    AND e.tus <= t2.t2 + 86400000000
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_viewed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_clicked,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_purchased,
        |  CAST(CASE WHEN (SELECT count(*) FROM t1) = 0 THEN 0
        |    ELSE ((SELECT count(*) FROM t2) * 10000) // (SELECT count(*) FROM t1)
        |    END AS BIGINT) AS click_bp,
        |  CAST(CASE WHEN (SELECT count(*) FROM t2) = 0 THEN 0
        |    ELSE ((SELECT count(*) FROM t3) * 10000) // (SELECT count(*) FROM t2)
        |    END AS BIGINT) AS purchase_bp,
        |  CAST(CASE WHEN (SELECT count(DISTINCT user_id) FROM ev) = 0 THEN 0
        |    ELSE ((SELECT count(*) FROM t3) * 10000)
        |      // (SELECT count(DISTINCT user_id) FROM ev)
        |    END AS BIGINT) AS overall_bp,
        |  (SELECT CAST(coalesce(sum(t3 - t1), 0) AS BIGINT) FROM t3)
        |    AS convert_us_sum""".stripMargin,
    "evt_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        |sizes AS (
        |  SELECT cohort_day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
        |  FROM cohort GROUP BY cohort_day),
        |cells AS (
        |  SELECT c.cohort_day,
        |    CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS day_offset,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |  FROM ev e JOIN cohort c ON c.user_id = e.user_id
        |  WHERE date_diff('day', c.cohort_day, e.day) <= 14
        |  GROUP BY 1, 2)
        |SELECT cells.cohort_day AS cohort_day, day_offset, n_active,
        |  sizes.n_cohort AS n_cohort,
        |  CAST((n_active * 10000) // sizes.n_cohort AS BIGINT) AS retained_bp
        |FROM cells JOIN sizes ON sizes.cohort_day = cells.cohort_day
        |ORDER BY cells.cohort_day, day_offset""".stripMargin,
  )
}
