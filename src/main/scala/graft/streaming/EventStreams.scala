package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.11: the reference has no
  * true streaming — its "incremental" is batch CDC — so this is the
  * engine's forward-looking path: the same event-table shapes exposed as
  * unbounded streams).
  *
  * Design: each transform takes a streaming DataFrame/Dataset and returns
  * the transformed stream — source and sink stay at the edges, so the
  * identical plan runs in batch (see `stream_window_agg`, whose batch
  * plan is this `windowedCounts` minus the watermark). State is bounded
  * by watermarks; at scale the shuffle key is (window, event_type) /
  * user_id, the same keys the batch jobs use.
  */
object EventStreams {

  /** events.parquet physical schema (ts is TIMESTAMP(NANOS) → read as
    * long under `nanosAsLong`, rebuilt to µs here, matching
    * graft.Tables.events).
    */
  val eventFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a testdata dir (one-file-per-table layout;
    * pathGlobFilter selects the events table). `maxFilesPerTrigger`
    * keeps micro-batches bounded when pointed at a real landing zone. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(eventFileSchema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling event-time window aggregate with a watermark — the
    * streaming twin of `stream_window_agg`. */
  def windowedCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup by event_id, state bounded by the watermark
    * (the streaming twin of the A7/W1 batch dedups). */
  def dedupEvents(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, last_ts: Timestamp)

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * count + last-seen timestamp (the streaming analogue of the
    * latest-wins W1 window). State is one tiny record per user —
    * watermark-free ProcessingTimeTimeout keeps it simple here; a
    * production deployment would add a timeout policy. */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val events = batch.toSeq
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, new Timestamp(0L)))
          val lastTs = (events.map(_.ts) :+ prev.last_ts).maxBy(_.getTime)
          val next = UserRunning(userId, prev.n_events + events.size, lastTs)
          state.update(next)
          next
      }
  }

  final case class SessionState(start: Timestamp, last: Timestamp, n_events: Long)

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, duration_sec: Long)

  /** Sessionization via flatMapGroupsWithState (the 0-or-many-outputs
    * variant of keyed state): events within `gapSec` of each other
    * extend a user's open session; a larger gap CLOSES the session and
    * emits it, then opens a new one — the canonical 0..n-rows-per-group
    * case mapGroupsWithState cannot express. Event-time-timeout closes
    * idle sessions when the watermark passes the gap, bounding state at
    * one open session per active user (at 100 TB the shuffle key is
    * user_id, same as the batch jobs; state size is O(active users)).
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 watermark: String = "1 day"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the session gap: close and emit
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.start, s.last, s.n_events,
              (s.last.getTime - s.start.getTime) / 1000L))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
                  // a watermark-admitted late event can predate the open
                  // session (negative delta passes the gap check): extend
                  // with min/max so start/last never move backward/forward
                  // wrongly — naive `last = e.ts` shrank the session and
                  // could emit negative durations
                  open = Some(SessionState(
                    new Timestamp(math.min(s.start.getTime, e.ts.getTime)),
                    new Timestamp(math.max(s.last.getTime, e.ts.getTime)),
                    s.n_events + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start, s.last, s.n_events,
                    (s.last.getTime - s.start.getTime) / 1000L)
                  open = Some(SessionState(e.ts, e.ts, 1L))
                case None =>
                  open = Some(SessionState(e.ts, e.ts, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
