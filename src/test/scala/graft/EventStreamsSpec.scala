package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{count, hash, lit, pmod, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming specs: the windowed aggregate, watermark dedup,
  * and mapGroupsWithState running counts, driven through MemoryStream
  * micro-batches; plus the parquet file source against sf0.001 checked
  * for batch/stream plan equivalence.
  */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts over MemoryStream match the batch aggregate") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 11:00:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-02 09:00:00"), 1, "view", 5.0))
    val q = EventStreams.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_agg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg").orderBy("day", "event_type")
        .as[(java.sql.Date, String, Long, Double)].collect().toSeq
      assert(got == Seq(
        (java.sql.Date.valueOf("2024-01-01"), "click", 2L, 3.0),
        (java.sql.Date.valueOf("2024-01-02"), "view", 1L, 5.0)))
      // second micro-batch updates the same window
      stream.addData(Event(4, ts("2024-01-01 12:00:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val upd = spark.table("win_agg")
        .where($"day" === "2024-01-01" && $"event_type" === "click")
        .as[(java.sql.Date, String, Long, Double)].head()
      assert(upd._3 == 3L && upd._4 == 7.0)
    } finally q.stop()
  }

  test("native session_window stream emits closed sessions equal to the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 1: two events 10 min apart (one session) then a 2h gap
    // (second session); user 2: one lone event
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      Event(3, ts("2024-01-01 10:05:00"), 2, "view", 2.0),
      Event(4, ts("2024-01-01 12:30:00"), 1, "click", 1.0))
    stream.addData(events: _*)
    val q = EventStreams.sessionWindowAgg(stream.toDF())
      .writeStream.format("memory").queryName("sess_win").outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark far past everything closes all sessions
      stream.addData(Event(99, ts("2024-01-03 00:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Event(100, ts("2024-01-04 00:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sess_win")
        .filter($"user_id" =!= 9)
        .select("user_id", "session_start", "session_end", "n_events", "sum_event_id")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2.getTime))
      // batch twin: the SAME transform over the same bounded frame
      val batch = EventStreams.sessionWindowAgg(events.toDF())
        .select("user_id", "session_start", "session_end", "n_events", "sum_event_id")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2.getTime))
      assert(got == batch, s"stream sessions $got != batch sessions $batch")
      assert(got.map(r => (r._1, r._4)).sorted == Seq((1L, 1L), (1L, 2L), (2L, 1L)),
        s"unexpected session shapes: $got")
    } finally q.stop()
  }

  test("streaming novelty filter: stream-static band anti-join equals the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val spec = "1000003,12345;999983,54321;999979,11111;1000033,77777"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "sphinx of black quartz judge my vow right now")).toDF("doc_id", "text")
    val index = EventStreams.corpusBandIndex(corpus, spec)

    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = EventStreams.novelDocuments(docs, index, spec)
      .writeStream.format("memory").queryName("novel_docs").outputMode("append").start()
    try {
      // 10 = exact copy of corpus doc 1 (identical shingle set → both
      // bands collide → filtered); 11 = genuinely new; 12 = sub-shingle
      // length (novel passthrough); second batch re-checks statelessly
      stream.addData(
        (10L, "the quick brown fox jumps over the lazy dog end"),
        (11L, "completely different words about entirely unrelated content here"),
        (12L, "too short"))
      q.processAllAvailable()
      stream.addData((13L, "pack my box with five dozen liquor jugs today"),
        (14L, "another fresh document with its own vocabulary stream"))
      q.processAllAvailable()
      val got = spark.table("novel_docs").as[Long].collect().toSet
      assert(got == Set(11L, 12L, 14L))
      // batch twin over the union of both micro-batches — identical result
      val batchDocs = Seq(
        (10L, "the quick brown fox jumps over the lazy dog end"),
        (11L, "completely different words about entirely unrelated content here"),
        (12L, "too short"),
        (13L, "pack my box with five dozen liquor jugs today"),
        (14L, "another fresh document with its own vocabulary stream"))
        .toDF("doc_id", "text")
      val batch = EventStreams.novelDocuments(batchDocs, index, spec)
        .as[Long].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming semantic decontam: stream-static probe join equals the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // two eval-suite vectors with distinct directions
    def vec(f: Int => Float): Seq[Float] = Seq.tabulate(64)(f)
    val evalA = vec(i => (i % 7) + 1f)
    val evalB = vec(i => if (i % 2 == 0) 3f else -1f)
    val evalIndex = EventStreams.evalBandIndex(
      Seq((100L, evalA), (200L, evalB)).toDF("vec_id", "embedding"))

    val stream = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.contaminatedEmbeddings(
        stream.toDF().toDF("vec_id", "embedding"), evalIndex)
      .writeStream.format("memory").queryName("contam").outputMode("append").start()
    try {
      // 1 = exact copy of evalA (cos 1.0); 2 = evalA scaled ×2 — SAME
      // direction, so both the hyperplane signs and cosine are identical
      // (the paraphrase-contamination case n-gram overlap misses);
      // 3 = unrelated direction; 100 = evalA under the eval's OWN id
      // (self-match, excluded by id)
      stream.addData(
        (1L, evalA), (2L, evalA.map(_ * 2f)),
        (3L, vec(i => ((i * 13) % 9) - 4f)), (100L, evalA))
      q.processAllAvailable()
      // second micro-batch re-screens statelessly
      stream.addData((4L, evalB))
      q.processAllAvailable()
      val got = spark.table("contam")
        .as[(Long, Long, Long)].collect().toSet
      // distinct hits (per-band duplicates are the downstream's dedup)
      val hits = got.map { case (v, e, c) => (v, e, c) }
      assert(hits.map(t => (t._1, t._2)) == Set((1L, 100L), (2L, 100L), (4L, 200L)))
      // same-direction hits sit at cosine ~1.0 (sqrt rounding may land
      // the e6 floor at 999999); the 0.999 confirm floor is 999000
      assert(hits.forall(_._3 >= 999900L), s"expected same-direction hits, got $got")
      // batch twin over the union of both micro-batches
      val batch = EventStreams.contaminatedEmbeddings(
        Seq((1L, evalA), (2L, evalA.map(_ * 2f)),
          (3L, vec(i => ((i * 13) % 9) - 4f)), (100L, evalA), (4L, evalB))
          .toDF("vec_id", "embedding"), evalIndex)
        .as[(Long, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses re-delivered event_ids") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0), // dup in-batch
      Event(2, ts("2024-01-01 10:05:00"), 2, "view", 2.0))
    val q = EventStreams.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(Event(1, ts("2024-01-01 10:00:02"), 1, "click", 1.0)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap and emits 0..n rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 1: two events 10 min apart (one session), then a 2h gap opens
    // a second session; user 2: one lone event
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      Event(3, ts("2024-01-01 10:05:00"), 2, "view", 2.0))
    val q = EventStreams.sessionize(stream.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      // no session closed yet (gap not exceeded, watermark not advanced)
      assert(spark.table("sessions").isEmpty)
      // 2h later: user 1's first session closes in-batch (gap exceeded)
      stream.addData(Event(4, ts("2024-01-01 12:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .select("user_id", "n_events", "duration_sec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(closed == Seq((1L, 2L, 600L)))
      // a watermark-admitted LATE event older than the open session's
      // last must not shrink it: user 3's session sees 12:10 then a
      // late 12:00 — duration grows to 10 min, never negative
      stream.addData(Event(10, ts("2024-01-01 12:10:00"), 30, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Event(11, ts("2024-01-01 12:00:00"), 30, "click", 1.0))
      q.processAllAvailable()
      // advancing the watermark far past everything times out both open
      // sessions (user 1's second, user 2's only)
      stream.addData(Event(5, ts("2024-01-03 00:00:00"), 3, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Event(6, ts("2024-01-04 00:00:00"), 3, "click", 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions")
        .select("user_id", "n_events", "duration_sec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(all.exists(r => r._1 == 1L && r._2 == 1L) &&
        all.exists(r => r._1 == 2L && r._2 == 1L),
        s"timed-out sessions not emitted: $all")
      // the late event merged into user 30's session without shrinking it
      val u30 = all.filter(_._1 == 30L)
      assert(u30 == Seq((30L, 2L, 600L)), s"late event corrupted session: $u30")
      assert(all.forall(_._3 >= 0L), s"negative session duration: $all")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0),
      Event(3, ts("2024-01-01 10:02:00"), 2, "click", 3.0))
    val q = EventStreams.runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      q.processAllAvailable()
      stream.addData(Event(4, ts("2024-01-01 11:00:00"), 1, "click", 4.0))
      q.processAllAvailable()
      val byUser = spark.table("running")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(byUser(1L) == 3L) // 2 in batch 1, +1 in batch 2
      assert(byUser(2L) == 1L)
      val lastTs = spark.table("running").where($"user_id" === 1 && $"n_events" === 3)
        .select("last_ts").as[Timestamp].head()
      assert(lastTs == ts("2024-01-01 11:00:00"))
    } finally q.stop()
  }

  test("streaming HLL distinct: O(sketch) state, equals batch estimate, dedup-free") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Event]
    // 3 micro-batches, 400 distinct users across overlapping ranges +
    // one whole batch re-delivered verbatim
    def ev(ids: Range, etype: String) = ids.map(u =>
      Event(u.toLong * 1000, ts("2024-01-01 10:00:00"), u.toLong, etype, 1.0))
    val b1 = ev(0 until 200, "click"); val b2 = ev(100 until 400, "click")
    val q = EventStreams.approxDistinctUsers(stream.toDS())
      .writeStream.format("memory").queryName("hll_running").outputMode("update").start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable() // re-delivery
      val ests = spark.table("hll_running").where($"event_type" === "click")
        .select("approx_users").as[Long].collect().toSeq
      // idempotent register max: the re-delivered batch must not move it
      assert(ests.length == 3 && ests(1) == ests(2),
        s"re-delivery moved the estimate: $ests")
      // stream estimate == the batch graft_hll_agg over the same keys
      val batchEst = (b1 ++ b2).map(_.user_id).distinct.toDF("k")
        .agg(org.apache.spark.sql.functions.expr("graft_hll_est(graft_hll_agg(k, 12))"))
        .head().getLong(0)
      assert(ests.last == batchEst, s"stream ${ests.last} != batch $batchEst")
      assert(math.abs(ests.last - 400L).toDouble / 400 < 0.05)
    } finally q.stop()
  }

  test("parquet file source stream equals the batch aggregate at sf0.001") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("file_win").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_win").orderBy("day", "event_type")
        .as[(java.sql.Date, String, Long, Double)].collect().toSeq
      val batch = graft.queries.PipelineQueries.queries.toMap
        .apply("stream_window_agg")(spark, sfDir)
        .as[(java.sql.Date, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val signups = MemoryStream[Event]
    val errors = MemoryStream[Event]
    signups.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "signup", 0.0),
      Event(2, ts("2024-01-01 10:00:00"), 2, "signup", 0.0))
    errors.addData(
      Event(10, ts("2024-01-01 12:00:00"), 1, "error", 0.0), // inside 6h
      Event(11, ts("2024-01-01 15:00:00"), 1, "error", 0.0), // still inside
      Event(12, ts("2024-01-01 16:00:01"), 2, "error", 0.0), // outside (>6h)
      Event(13, ts("2024-01-01 10:00:00"), 1, "error", 0.0)) // equal ts: excluded (strict >)
    val q = EventStreams.intervalJoin(signups.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("ivjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      // cross-batch: a late-but-in-window error still joins (state buffered)
      errors.addData(Event(14, ts("2024-01-01 15:59:59"), 2, "error", 0.0))
      q.processAllAvailable()
      val got = spark.table("ivjoin").select("signup_id", "error_id")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == Seq((1L, 10L), (1L, 11L), (2L, 14L)))
    } finally q.stop()
  }

  test("foreachBatch upsert sink folds micro-batches into latest-wins state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert")
    val table = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 11:00:00"), 1, "view", 2.0),
      Event(3, ts("2024-01-01 10:30:00"), 2, "click", 3.0))
    val q = EventStreams.upsertLatestSink(stream.toDF(), table, ckpt)
    try {
      q.processAllAvailable()
      // batch 2: user 1 gets a NEWER event (replaces), user 2 an OLDER
      // one (event-time latest-wins must keep the existing state row)
      stream.addData(
        Event(4, ts("2024-01-01 12:00:00"), 1, "purchase", 4.0),
        Event(5, ts("2024-01-01 09:00:00"), 2, "error", 5.0))
      q.processAllAvailable()
      val state = graft.operators.TableMerge.read(spark, table)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
      assert(state == Seq((1L, 4L, "purchase"), (2L, 3L, "click")))
    } finally q.stop()
  }

  test("streaming CDF matview: version-diff fold equals the direct aggregate, updates never double-count") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-matview")
    val base = dir.resolve("base").toString
    val view = dir.resolve("view").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, Long, Long)]
    val facts = stream.toDF().toDF("event_id", "user_id", "value_e2")
    val q = EventStreams.matviewDeltaSink(facts, base, view, ckpt)
    try {
      stream.addData((1L, 1L, 100L), (2L, 1L, 50L), (3L, 2L, 10L))
      q.processAllAvailable()
      // batch 2: new fact for user 2 AND a RE-DELIVERY of event 1 with
      // an UPDATED value — the view must absorb (999 - 100), not +999
      stream.addData((4L, 2L, 30L), (1L, 1L, 999L))
      q.processAllAvailable()
      // batch 3: fact that MOVES an event to another user (ownership
      // fix-up): post-pre diff debits user 1 and credits user 3
      stream.addData((2L, 3L, 50L))
      q.processAllAvailable()
      val got = graft.operators.TableMerge.read(spark, view)
        .select("user_id", "n", "sum_value_e2")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val direct = graft.operators.TableMerge.read(spark, base)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value_e2").as("sum_value_e2"))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got.filter(_._2 != 0L) == direct,
        s"view $got != direct aggregate $direct")
      assert(got.find(_._1 == 1L).exists(_._3 == 999L), s"update double-counted: $got")
    } finally q.stop()
  }

  test("matview replay: base-committed-view-not partial failure re-derives the lost delta; full replay is a no-op") {
    import spark.implicits._
    import graft.operators.TableMerge
    val dir = java.nio.file.Files.createTempDirectory("graft-matview-replay")
    val base = dir.resolve("base").toString
    val view = dir.resolve("view").toString
    def rows(t: (Long, Long, Long)*): org.apache.spark.sql.DataFrame =
      t.toDF("event_id", "user_id", "value_e2")
    // batch 0: clean apply
    EventStreams.applyMatviewBatch(rows((1L, 1L, 100L), (2L, 2L, 10L)), 0L, base, view, "specrun")
    // batch 1 PARTIAL FAILURE: the base upsert committed (tagged with its
    // batchId + pre-version, exactly as the sink writes it) but the driver
    // died before the view upsert — reproduce that intermediate state by
    // hand, then deliver the foreachBatch replay.
    val pre = TableMerge.versions(base).head
    TableMerge.upsert(spark, base, rows((1L, 1L, 500L), (3L, 2L, 7L)), Seq("event_id"),
      meta = Map(EventStreams.MatviewBatchKey -> "1", EventStreams.MatviewPreKey -> pre,
        EventStreams.MatviewRunKey -> "specrun"))
    EventStreams.applyMatviewBatch(rows((1L, 1L, 500L), (3L, 2L, 7L)), 1L, base, view, "specrun")
    def viewState(): Seq[(Long, Long, Long)] = TableMerge.read(spark, view)
      .select("user_id", "n", "sum_value_e2")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val afterReplay = viewState()
    // the naive head-vs-head diff would see pre==post and lose batch 1:
    // user 1 stuck at 100, user 2 missing event 3. The tagged replay
    // recovers the true delta (update 100→500, insert 7).
    assert(afterReplay == Seq((1L, 1L, 500L), (2L, 2L, 17L)),
      s"partial-failure replay lost the batch: $afterReplay")
    // FULL replay of an applied batch (crash after view commit, before
    // checkpoint): view commit meta says batch 1 applied → no-op.
    EventStreams.applyMatviewBatch(rows((1L, 1L, 500L), (3L, 2L, 7L)), 1L, base, view, "specrun")
    assert(viewState() == afterReplay, "full replay double-applied the delta")
  }

  test("streaming SCD2 sink: NULL attr transitions version (null-safe compare), out-of-order eff rejected") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-scd2null")
    val dim = dir.resolve("dim").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, Option[Long], String)]
    val feed = stream.toDF().toDF("key", "attr", "eff")
    val q = EventStreams.scd2Sink(feed, dim, ckpt)
    try {
      stream.addData((1L, Some(100L), "2024-01-01"), (2L, None, "2024-01-01"))
      q.processAllAvailable()
      // key 1: value → NULL; key 2: NULL → value. Both are real changes
      // a null-unsafe =!= silently drops (predicate evaluates to NULL).
      stream.addData((1L, None, "2024-02-01"), (2L, Some(200L), "2024-02-01"))
      q.processAllAvailable()
      // out-of-order restatement: eff BEFORE key 1's open row's
      // valid_from would create an overlapping version — rejected.
      stream.addData((1L, Some(999L), "2024-01-15"))
      q.processAllAvailable()
      val got = graft.operators.TableMerge.read(spark, dim)
        .select("key", "attr", "valid_from", "valid_to", "is_current")
        .as[(Long, Option[Long], String, Option[String], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))
      val want = Seq(
        (1L, Some(100L), "2024-01-01", Some("2024-02-01"), false),
        (1L, None, "2024-02-01", None, true), // 2024-01-15 restatement rejected
        (2L, None, "2024-01-01", Some("2024-02-01"), false),
        (2L, Some(200L), "2024-02-01", None, true))
      assert(got == want, s"SCD2 null-transition mismatch:\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("streaming SCD2 sink: history accumulates closes/opens across batches, unchanged keys untouched") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-scd2")
    val dim = dir.resolve("dim").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, Long, String)]
    val feed = stream.toDF().toDF("key", "attr", "eff")
    val q = EventStreams.scd2Sink(feed, dim, ckpt)
    try {
      stream.addData((1L, 100L, "2024-01-01"), (2L, 200L, "2024-01-01"))
      q.processAllAvailable()
      // change key 1, insert key 3, re-send key 2 UNCHANGED
      stream.addData((1L, 150L, "2024-02-01"), (3L, 300L, "2024-02-01"),
        (2L, 200L, "2024-02-01"))
      q.processAllAvailable()
      // second change for key 1 — its history grows to three rows
      stream.addData((1L, 175L, "2024-03-01"))
      q.processAllAvailable()
      val got = graft.operators.TableMerge.read(spark, dim)
        .select("key", "attr", "valid_from", "valid_to", "is_current")
        .as[(Long, Long, String, Option[String], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))
      val want = Seq(
        (1L, 100L, "2024-01-01", Some("2024-02-01"), false),
        (1L, 150L, "2024-02-01", Some("2024-03-01"), false),
        (1L, 175L, "2024-03-01", None, true),
        (2L, 200L, "2024-01-01", None, true), // unchanged re-send: NOT re-dated
        (3L, 300L, "2024-02-01", None, true))
      assert(got == want, s"SCD2 history mismatch:\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("upsert sink micro-batch rewrites only touched buckets (O(batch), not O(state))") {
    import spark.implicits._
    import java.nio.file.{Files, Path, Paths}
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-buckets")
    val table = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString

    val nBuckets = 64
    def bucketOf(userId: Long): Int = spark.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(userId)),
        org.apache.spark.sql.functions.lit(nBuckets)))
      .head().getInt(0)
    // two users guaranteed to land in DIFFERENT buckets (search a handful
    // of ids rather than hardcoding hash outputs)
    val userA = 1L
    val userB = (2L to 20L).find(bucketOf(_) != bucketOf(userA)).get

    def inodesOf(bucket: Int): Set[Long] = {
      val live = Paths.get(table,
        Files.readString(Paths.get(table, "_current")).trim)
      val bdir = live.resolve(s"bucket=$bucket")
      val files = scala.collection.mutable.Set[Long]()
      Files.walk(bdir).forEach { p: Path =>
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          files += Files.getAttribute(p, "unix:ino").asInstanceOf[Long]
      }
      files.toSet
    }

    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts("2024-01-01 10:00:00"), userA, "click", 1.0),
      Event(2, ts("2024-01-01 10:30:00"), userB, "view", 2.0))
    val q = EventStreams.upsertLatestSink(stream.toDF(), table, ckpt, nBuckets)
    try {
      q.processAllAvailable()
      val bA = bucketOf(userA); val bB = bucketOf(userB)
      val inodesBBefore = inodesOf(bB)
      val inodesABefore = inodesOf(bA)
      // batch 2 touches ONLY user A's bucket
      stream.addData(Event(3, ts("2024-01-01 12:00:00"), userA, "purchase", 3.0))
      q.processAllAvailable()
      // untouched bucket B: identical inodes (hard-linked, not rewritten)
      assert(inodesOf(bB) == inodesBBefore,
        "untouched bucket was rewritten — micro-batch cost is O(state)")
      // touched bucket A: fresh files
      assert((inodesOf(bA) intersect inodesABefore).isEmpty)
      val state = graft.operators.TableMerge.read(spark, table)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
      assert(state == Seq((userA, 3L, "purchase"), (userB, 2L, "view")).sortBy(_._1))
    } finally q.stop()
  }

  test("upsert sink auto-compaction folds a fragmented bucket without losing state") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-compact")
    val table = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString
    val nBuckets = 2
    def bucketOf(userId: Long): Int = spark.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(userId)),
        org.apache.spark.sql.functions.lit(nBuckets)))
      .head().getInt(0)
    // 8 users in bucket 0 (fragment it: the merge shuffle spreads them
    // over tasks → several files) and one user in bucket 1
    val groupA = (1L to 200L).filter(bucketOf(_) == 0).take(8)
    val userB = (1L to 200L).find(bucketOf(_) == 1).get
    def files(bucket: Int): Int = {
      val live = Paths.get(table,
        Files.readString(Paths.get(table, "_current")).trim)
      Option(live.resolve(s"bucket=$bucket").toFile.listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    }
    // pre-fragment bucket 0 (explicit repartition survives AQE's
    // coalescing, unlike the sink's own tiny writes at test scale)
    val seed = groupA.zipWithIndex.map { case (u, i) =>
      (i.toLong, ts("2024-01-01 10:00:00"), u, "click", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("bucket", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"user_id"),
        org.apache.spark.sql.functions.lit(nBuckets)))
    graft.operators.TableMerge.createOrReplace(seed.repartition(6), table, Seq("bucket"))
    assert(files(0) > 1, s"fixture bucket not fragmented: ${files(0)} file(s)")
    val stream = MemoryStream[Event]
    stream.addData(Event(100, ts("2024-01-01 11:00:00"), userB, "view", 2.0))
    val q = EventStreams.upsertLatestSink(stream.toDF(), table, ckpt,
      nBuckets, compactEvery = 2)
    try {
      q.processAllAvailable() // batchId 0: no compaction
      stream.addData(Event(101, ts("2024-01-01 11:30:00"), userB, "view", 2.5))
      q.processAllAvailable() // batchId 1: no compaction yet
      stream.addData(Event(102, ts("2024-01-01 12:00:00"), userB, "view", 3.0))
      q.processAllAvailable() // batchId 2: compacts bucket 0, then merges bucket 1
      assert(files(0) == 1, s"bucket 0 not compacted: ${files(0)} files")
      val state = graft.operators.TableMerge.read(spark, table)
        .select("user_id", "event_id").as[(Long, Long)].collect().toMap
      groupA.zipWithIndex.foreach { case (u, i) => assert(state(u) == i.toLong) }
      assert(state(userB) == 102L)
      assert(state.size == groupA.size + 1)
    } finally q.stop()
  }

  test("band-index sink: stream-maintained index equals batch-maintained; quiet buckets keep inodes") {
    import spark.implicits._
    import java.nio.file.{Files, Path, Paths}
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-band-index")
    val table = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString
    val spec = "1000003,12345;999983,54321;999979,11111;1000033,77777"
    val nBuckets = 8

    def bucketOf(docId: Long): Int = spark.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(docId)),
        org.apache.spark.sql.functions.lit(nBuckets))).head().getInt(0)

    def inodesOf(bucket: Int): Set[Long] = {
      val live = Paths.get(table, Files.readString(Paths.get(table, "_current")).trim)
      val bdir = live.resolve(s"bucket=$bucket")
      val files = scala.collection.mutable.Set[Long]()
      if (Files.exists(bdir)) Files.walk(bdir).forEach { p: Path =>
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          files += Files.getAttribute(p, "unix:ino").asInstanceOf[Long]
      }
      files.toSet
    }

    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "sphinx of black quartz judge my vow right now"))
    // batch 2: a new doc + a RE-SCRAPE of doc 1 (band values change in
    // place under the same (bucket, doc_id, band_idx) key)
    val batch2 = Seq(
      (4L, "another fresh document with its own vocabulary stream"),
      (1L, "the quick brown fox jumps over the lazy cat end"))

    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.bandIndexSink(
      stream.toDF().toDF("doc_id", "text"), spec, table, ckpt, nBuckets)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      val touched2 = batch2.map(t => bucketOf(t._1)).toSet
      val quiet = batch1.map(t => bucketOf(t._1)).toSet -- touched2
      assert(quiet.nonEmpty, "fixture degenerate: every bucket touched by batch 2")
      val quietBefore = quiet.map(b => b -> inodesOf(b)).toMap
      stream.addData(batch2: _*)
      q.processAllAvailable()
      quiet.foreach { b =>
        assert(inodesOf(b) == quietBefore(b), s"quiet bucket $b rewritten")
      }
      // batch twin: index built in one shot from the LATEST text per doc
      val latest = (batch1 ++ batch2).groupBy(_._1).map(_._2.last).toSeq
      val expected = EventStreams.corpusBandIndex(latest.toDF("doc_id", "text"), spec)
        .as[(Long, Int, Long)].collect().toSet
      val got = graft.operators.TableMerge.read(spark, table)
        .select("doc_id", "band_idx", "band_val")
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expected)
      // composition: the novelty filter reading the STREAM-maintained
      // index certifies an exact copy as non-novel and a new doc as novel
      val probe = Seq(
        (10L, "pack my box with five dozen liquor jugs today"),
        (11L, "entirely different sentence with brand new words only")).toDF("doc_id", "text")
      val idx = graft.operators.TableMerge.read(spark, table)
        .select("doc_id", "band_idx", "band_val")
      val novel = EventStreams.novelDocuments(probe, idx, spec).as[Long].collect().toSet
      assert(novel == Set(11L))
    } finally q.stop()
  }

  test("winnow-print index sink: stream == batch, re-scrape replaces the print SET, shifted near-dup caught") {
    import spark.implicits._
    import java.nio.file.{Files, Path, Paths}
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-winnow")
    val table = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString
    val nBuckets = 32
    def bucketOf(id: Long): Int = spark.range(1)
      .select(pmod(hash(lit(id)), lit(nBuckets))).head().getInt(0)
    def inodesOf(bucket: Int): Set[Long] = {
      val live = Paths.get(table, Files.readString(Paths.get(table, "_current")).trim)
      val bdir = live.resolve(s"bucket=$bucket")
      val files = scala.collection.mutable.Set[Long]()
      if (Files.exists(bdir)) Files.walk(bdir).forEach { p: Path =>
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          files += Files.getAttribute(p, "unix:ino").asInstanceOf[Long]
      }
      files.toSet
    }
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs today friend"),
      (3L, "sphinx of black quartz judge my vow right now ok"))
    // batch 2: a new doc + a RE-SCRAPE of doc 1 whose text change
    // CHANGES ITS PRINT SET (stale prints must vanish, not linger)
    val batch2 = Seq(
      (4L, "another fresh document with its own vocabulary stream here"),
      (1L, "totally rewritten content with nothing shared at all anymore"))
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.winnowIndexSink(
      stream.toDF().toDF("doc_id", "text"), table, ckpt, nBuckets = nBuckets)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      val touched2 = batch2.map(t => bucketOf(t._1)).toSet
      val quiet = batch1.map(t => bucketOf(t._1)).toSet -- touched2
      assert(quiet.nonEmpty, "fixture degenerate: every bucket touched by batch 2")
      val quietBefore = quiet.map(b => b -> inodesOf(b)).toMap
      stream.addData(batch2: _*)
      q.processAllAvailable()
      quiet.foreach { b =>
        assert(inodesOf(b) == quietBefore(b), s"quiet bucket $b rewritten")
      }
      // stream-built == batch-built over the latest text per doc — in
      // particular doc 1's ORIGINAL prints are gone (set replace, not
      // key-slot update)
      val latest = (batch1 ++ batch2).groupBy(_._1).map(_._2.last).toSeq
      val expected = EventStreams.winnowPrintIndex(latest.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toSet
      val got = graft.operators.TableMerge.read(spark, table)
        .select("doc_id", "h").as[(Long, Long)].collect().toSet
      assert(got == expected, "stream-maintained print set != batch-built")
      // probe through the STREAM-built index: a first-token-dropped
      // near-dup of doc 2 must match doc 2 (the interior-window
      // guarantee); a fresh-vocabulary doc must match nothing
      val probe = Seq(
        (20L, "my box with five dozen liquor jugs today friend"),
        (21L, "entirely different sentence with brand new words only here")).toDF("doc_id", "text")
      val idx = graft.operators.TableMerge.read(spark, table).select("doc_id", "h")
      val matches = EventStreams.winnowMatches(probe, idx)
        .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(matches == Set((20L, 2L)), s"winnow match set wrong: $matches")
    } finally q.stop()
  }

  test("streaming BPE tokenization equals the batch apply, including unseen words") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // train on the real sf0.001 corpus — the shipped artifact
    val (merges, _) = graft.queries.BpeQueries.learnMerges(spark, "/root/testdata/sf0.001")
    assert(merges.nonEmpty)
    val docs = Seq(
      (1L, "key agg row scan slow fast table value"),
      (2L, "zzz unseen wordforms qq"), // vocabulary never seen in training
      (3L, "table table table"))
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.bpeTokenCounts(stream.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_counts").outputMode("complete").start()
    try {
      stream.addData(docs.take(2): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("bpe_counts").as[(Long, Long, Long)].collect().toSet
      val batch = EventStreams.bpeTokenCounts(docs.toDF("doc_id", "text"), merges)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch)
      // merges actually fired: fewer BPE tokens than characters somewhere
      val chars = docs.map { case (id, t) => id -> t.replace(" ", "").length.toLong }.toMap
      assert(batch.exists { case (id, _, n) => n < chars(id) },
        s"no merge applied anywhere: $batch vs $chars")
    } finally q.stop()
  }

  test("mini-batch k-means sink: streamed updates equal a driver replay of the same batches") {
    import spark.implicits._
    import graft.operators.MiniBatchKmeans
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mbk")
    val table = dir.resolve("cents").toString
    val ckpt = dir.resolve("ckpt").toString
    def vec(seed: Long): Seq[Double] =
      Seq.tabulate(64)(i => (((seed * 13 + i * 7) % 17) - 8) / 9.0)
    val b1 = (1L to 6L).map(i => (i, vec(i)))
    val b2 = (7L to 10L).map(i => (i, vec(i * 3)))

    val stream = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.kmeansUpdateSink(
      stream.toDF().toDF("vec_id", "embedding"), table, ckpt, k = 4)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = graft.operators.TableMerge.read(spark, table)
        .select("centroid_id", "cvec", "n")
        .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq
      // driver replay of the identical batch sequence
      var cents = MiniBatchKmeans.gridInit(4)
      cents = MiniBatchKmeans.step(b1.toDF("vec_id", "embedding"), cents)
      cents = MiniBatchKmeans.step(b2.toDF("vec_id", "embedding"), cents)
      assert(streamed == cents)
      // counts accumulated across batches; at least one centroid updated
      assert(streamed.map(_._3).sum == (b1.size + b2.size).toLong)
      assert(streamed.exists { case (cid, v, _) =>
        v != MiniBatchKmeans.gridInit(4).find(_._1 == cid).get._2 })
    } finally q.stop()
  }

  test("k-means sink: replayed batch is a no-op; reset lineage fails loudly") {
    import spark.implicits._
    import graft.streaming.EventStreams.applyKmeansBatch
    val dir = java.nio.file.Files.createTempDirectory("graft-mbk-replay")
    val table = dir.resolve("cents").toString
    def vec(seed: Long): Seq[Double] =
      Seq.tabulate(64)(i => (((seed * 13 + i * 7) % 17) - 8) / 9.0)
    val b1 = (1L to 6L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    applyKmeansBatch(b1, 0L, table, 4, "runA")
    val after1 = graft.operators.TableMerge.read(spark, table)
      .select("centroid_id", "cvec", "n")
      .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    // at-least-once replay of the SAME batch: the running-mean fold is
    // not idempotent, so without the batch tag this would double-count
    applyKmeansBatch(b1, 0L, table, 4, "runA")
    val after2 = graft.operators.TableMerge.read(spark, table)
      .select("centroid_id", "cvec", "n")
      .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(after2 == after1, "replayed batch must be a no-op")
    assert(after2.map(_._3).sum == 6L, "counts must not double-count")
    // reset checkpoint (new run id) over KEPT centroids: batchIds
    // restart at 0 — must fail loudly, not silently skip/double-count
    val e = intercept[IllegalArgumentException](
      applyKmeansBatch(b1, 0L, table, 4, "runB"))
    assert(e.getMessage.contains("runA"))
  }

  test("matview sink: reset lineage over kept base/view tables fails loudly") {
    import spark.implicits._
    def rows(t: (Long, Long, Long)*) =
      t.toDF("event_id", "user_id", "value_e2")
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-lineage")
    val base = dir.resolve("base").toString
    val view = dir.resolve("view").toString
    EventStreams.applyMatviewBatch(rows((1L, 1L, 100L)), 0L, base, view, "runA")
    EventStreams.applyMatviewBatch(rows((2L, 1L, 50L)), 1L, base, view, "runA")
    // a reset checkpoint restarts batchIds at 0 under a fresh run id:
    // pre-r18 the bare `>= batchId` skip silently dropped every new
    // batch until it exceeded the old lineage's high-water mark
    val e = intercept[IllegalArgumentException](
      EventStreams.applyMatviewBatch(rows((3L, 2L, 7L)), 0L, base, view, "runB"))
    assert(e.getMessage.contains("runA"))
  }

  test("vector-index sink: stream-maintained IVF layout equals from-scratch, moves cross partitions") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-vec-index")
    val table = dir.resolve("ivf").toString
    val ckpt = dir.resolve("ckpt").toString

    // deterministic 64-dim vectors; batch 2 re-embeds vec 1 with its
    // REVERSE (moves centroid for most vectors) and adds a new one
    def vec(seed: Long): Seq[Double] =
      Seq.tabulate(64)(i => (((seed * 31 + i * 17) % 19) - 9) / 10.0 + (seed % 5) * 0.01)
    val batch1 = Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)), (4L, vec(4)))
    val batch2 = Seq((5L, vec(5)), (1L, vec(1).reverse))

    val stream = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.vectorIndexSink(
      stream.toDF().toDF("vec_id", "embedding"), table, ckpt)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      def assignOf(rows: Seq[(Long, Seq[Double])]): Map[Long, Int] =
        rows.toDF("vec_id", "embedding")
          .selectExpr("vec_id", "graft_ivf_assign(embedding, 16) AS c")
          .as[(Long, Int)].collect().toMap
      val pre = assignOf(batch1)
      val post = assignOf(Seq((1L, vec(1).reverse), (5L, vec(5))))
      assert(post(1L) != pre(1L), "fixture degenerate: re-embed did not move centroids")
      // a centroid holding only vectors untouched by batch 2 must keep inodes
      val touched2 = Set(post(1L), post(5L), pre(1L))
      val quiet = (pre - 1L).values.toSet -- touched2
      assert(quiet.nonEmpty, "fixture degenerate: every centroid touched")
      def inodesOf(c: Int): Set[Long] = {
        val live = Paths.get(table, Files.readString(Paths.get(table, "_current")).trim)
        val bdir = live.resolve(s"centroid_id=$c")
        if (!Files.exists(bdir)) Set.empty
        else Option(bdir.toFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => Files.getAttribute(f.toPath, "unix:ino").asInstanceOf[Long]).toSet
      }
      val quietBefore = quiet.map(c => c -> inodesOf(c)).toMap
      stream.addData(batch2: _*)
      q.processAllAvailable()
      quiet.foreach(c => assert(inodesOf(c) == quietBefore(c), s"quiet centroid $c rewritten"))
      // the moved vector lives ONLY at its new centroid
      val live = graft.operators.TableMerge.read(spark, table)
        .selectExpr("vec_id", "CAST(centroid_id AS INT) AS c").as[(Long, Int)].collect()
      assert(live.count(_._1 == 1L) == 1 && live.find(_._1 == 1L).get._2 == post(1L))
      // stream-maintained == from-scratch over the latest state
      val latest = Seq((1L, vec(1).reverse), (2L, vec(2)), (3L, vec(3)), (4L, vec(4)), (5L, vec(5)))
      val expected = latest.toDF("vec_id", "embedding")
        .selectExpr("vec_id", "graft_ivf_assign(embedding, 16) AS c")
        .as[(Long, Int)].collect().toSet
      assert(live.toSet == expected)
    } finally q.stop()
  }
}
