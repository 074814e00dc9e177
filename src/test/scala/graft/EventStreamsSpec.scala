package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("watermarked tumbling window evicts state and counts per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedTypeCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(12), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      mem.addData((ts(60), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("event_type", "cnt", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))   // minutes 0-10
      assert(rows.contains(("view", 1L, 5.0)))    // minutes 10-20
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.streamingSessions(mem.toDS(), gapUs = 10L * 60 * 1000000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart (one session), then a 30-min gap
      mem.addData(Event(1, ts(0), 1.0), Event(1, ts(5), 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(35), 7.0)) // closes the first session
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
      assert(sessions.length == 1)
      assert(sessions.head == Session(1, 2, 5L * 60 * 1000000, 3.0))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "payload")
    val q = EventStreams.dedupStream(df, Seq("event_id"), Some("ts"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((2L, ts(3), "b-dup"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val got = spark.table("deduped").select("event_id")
        .as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = stream.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, 5.0), (2L, 1.0), (9L, 2.0))
      q.processAllAvailable()
      val got = spark.table("enriched").as[(Long, Double, Option[String])]
        .collect().map(r => r._1 -> r._3).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 9L -> None))
    } finally q.stop()
  }

  test("streaming funnel: strict ordering per user, advances across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    val mem = MemoryStream[TypedEvent]
    // idleTimeout disabled: with a timeout armed the stream schedules
    // batches continuously to fire evictions and processAllAvailable
    // never settles (see streamingFunnel scaladoc)
    val q = EventStreams.streamingFunnel(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        // user 1: full ordered funnel within one batch
        TypedEvent(1, ts(1), "view"), TypedEvent(1, ts(2), "click"), TypedEvent(1, ts(3), "purchase"),
        // user 2: purchase BEFORE click -> purchase never counts
        TypedEvent(2, ts(1), "view"), TypedEvent(2, ts(2), "purchase"), TypedEvent(2, ts(3), "click"),
        // user 3: click BEFORE view -> only the view stage
        TypedEvent(3, ts(1), "click"), TypedEvent(3, ts(2), "view"),
        // user 5: completes AND re-enters within one batch — the reset
        // must not depend on the micro-batch boundary
        TypedEvent(5, ts(1), "view"), TypedEvent(5, ts(2), "click"),
        TypedEvent(5, ts(3), "purchase"), TypedEvent(5, ts(4), "view"))
      q.processAllAvailable()
      // user 4 advances across separate micro-batches; user 5's second
      // cycle continues from the view taken in the previous batch
      mem.addData(TypedEvent(4, ts(1), "view"), TypedEvent(5, ts(5), "click"))
      q.processAllAvailable()
      mem.addData(TypedEvent(4, ts(2), "click"))
      q.processAllAvailable()
      val got = spark.table("funnel_adv")
        .groupBy("user_id").count().as[(Long, Long)].collect().toMap
      // stages reached: u1 all three, u2 view+click, u3 view only,
      // u4 view+click, u5 full cycle + second cycle view+click
      assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 5L))
      // and the emitted stage names respect the chain order per user
      val u1 = spark.table("funnel_adv").where($"user_id" === 1L)
        .orderBy("stage_idx").select("stage").as[String].collect().toSeq
      assert(u1 == Seq("view", "click", "purchase"))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to in-horizon views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val q = EventStreams.clickAttribution(
        views.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*),
        horizon = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: view at t0 and t30; clicks at t20 (sees view@0) and
      // t75 (sees only view@30 — view@0 is past the 1h horizon).
      // user 2: click with NO prior view -> never emitted (inner join).
      // view AFTER the click (user 1 view@80 vs click@75) never matches.
      views.addData((100L, 1L, ts(0)), (101L, 1L, ts(30)), (102L, 1L, ts(80)))
      clicks.addData((200L, 1L, ts(20)), (201L, 1L, ts(75)), (202L, 2L, ts(75)))
      q.processAllAvailable()
      val got = spark.table("attrib").select("click_id", "view_id")
        .as[(Long, Long)].collect().toSet
      // click@20 -> view@0 only; click@75 -> view@30 only (view@0 is
      // outside the horizon, view@80 is after the click); user 2 absent
      assert(got == Set((200L, 100L), (201L, 101L)))
    } finally q.stop()
  }

  test("left-outer interval join emits un-attributed clicks after the watermark closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val q = EventStreams.clickAttribution(
        views.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*),
        horizon = "1 hour", lateness = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 click has a view; user 9 click has none
      views.addData((100L, 1L, ts(0)))
      clicks.addData((200L, 1L, ts(20)), (300L, 9L, ts(20)))
      q.processAllAvailable()
      // the null row can only emit once the watermark (min across BOTH
      // inputs) passes click_ts + horizon + lateness — advance both
      views.addData((101L, 1L, ts(600)))
      clicks.addData((201L, 1L, ts(600)))
      q.processAllAvailable()
      // outer rows materialize on the state-eviction pass; one more
      // micro-batch gives the join a batch in which to emit them
      views.addData((102L, 1L, ts(700)))
      clicks.addData((202L, 1L, ts(700)))
      q.processAllAvailable()
      val got = spark.table("attrib_outer").select("click_id", "view_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(got(200L) == Some(100L), "attributed click keeps its view")
      assert(got.contains(300L) && got(300L).isEmpty,
        s"un-attributed click must emit with a null view after watermark closure, got $got")
    } finally q.stop()
  }

  test("interval join kernel runs identically on batch frames") {
    import spark.implicits._
    val cols = Seq("event_id", "user_id", "ts")
    val v = Seq((100L, 1L, ts(0)), (101L, 1L, ts(30))).toDF(cols: _*)
    val c = Seq((200L, 1L, ts(20)), (201L, 1L, ts(75))).toDF(cols: _*)
    val got = EventStreams.clickAttribution(v, c).select("click_id", "view_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((200L, 100L), (201L, 101L)))
  }

  test("windowed counts run identically on a batch frame") {
    import spark.implicits._
    val batch = Seq((ts(1), "click", 1.0), (ts(4), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.windowedTypeCounts(batch, "10 minutes")
      .as[(Timestamp, String, Long, Double)].collect()
    assert(out.length == 1 && out.head._3 == 2L)
  }

  test("streaming debounce measures against the last KEPT event, across micro-batches") {
    import spark.implicits._
    import graft.streaming.EventStreams.TypedEvent
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    // 6-minute gap; events at minutes 0, 5, 10, 13, then a straggler at 9
    val q = EventStreams.streamingDebounce(mem.toDS(),
        minGapUs = 6L * 60 * 1000000, idleTimeout = None)
      .writeStream.format("memory").queryName("debounced")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(TypedEvent(1, ts(0), "click"), TypedEvent(1, ts(5), "click"))
      q.processAllAvailable()
      // state (last kept = minute 0) must carry into this batch:
      // minute 10 is ≥6 past minute 0 → kept; 13 is <6 past 10 → dropped
      mem.addData(TypedEvent(1, ts(10), "click"), TypedEvent(1, ts(13), "click"))
      q.processAllAvailable()
      // out-of-order straggler BEHIND the last kept event → dropped
      mem.addData(TypedEvent(1, ts(9), "click"))
      q.processAllAvailable()
      val kept = spark.table("debounced").as[TypedEvent].collect()
        .map(e => (e.ts.getTime - ts(0).getTime) / 60000L).toSet
      assert(kept == Set(0L, 10L), s"stateful debounce kept $kept")

      // the batch lag form disagrees HERE by design: minute 10 is <6
      // from its immediate predecessor (minute 5), so the vectorized
      // min-gap filter keeps only minute 0 on the same fixture
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("us")
      import org.apache.spark.sql.functions._
      val lagKept = Seq(0, 5, 10, 13).map(m => TypedEvent(1, ts(m), "click")).toDS()
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .where(col("gap").isNull || col("gap") >= 6L * 60 * 1000000)
        .select("us").as[Long].collect()
        .map(us => (us / 1000000L - ts(0).getTime / 1000L) / 60L).toSet
      assert(lagKept == Set(0L), s"lag form kept $lagKept")
    } finally q.stop()
  }

  test("streaming transitions chain across micro-batch boundaries and match the batch lag form") {
    import spark.implicits._
    import graft.streaming.EventStreams.{Transition, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = EventStreams.streamingTransitions(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("transitions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 view->click; u2 lone view (no pair yet)
      mem.addData(TypedEvent(1, ts(0), "view"), TypedEvent(1, ts(1), "click"),
        TypedEvent(2, ts(2), "view"))
      q.processAllAvailable()
      // batch 2: the boundary pairs chain against CARRIED state —
      // u1 click->purchase, u2 view->click
      mem.addData(TypedEvent(1, ts(3), "purchase"), TypedEvent(2, ts(4), "click"))
      q.processAllAvailable()
      val got = spark.table("transitions").as[Transition].collect()
        .map(t => (t.user_id, t.from_type, t.to_type)).toSet
      assert(got == Set(
        (1L, "view", "click"), (1L, "click", "purchase"), (2L, "view", "click")),
        s"streaming transitions: $got")

      // the batch lag form over the union of both batches agrees —
      // batch boundaries are invisible in the output
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us")
      import org.apache.spark.sql.functions._
      val batchPairs = Seq(
        TypedEvent(1, ts(0), "view"), TypedEvent(1, ts(1), "click"),
        TypedEvent(2, ts(2), "view"), TypedEvent(1, ts(3), "purchase"),
        TypedEvent(2, ts(4), "click")).toDS()
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("from_type", lag("event_type", 1).over(w))
        .where(col("from_type").isNotNull)
        .select(col("user_id"), col("from_type"), col("event_type"))
        .as[(Long, String, String)].collect().toSet
      assert(batchPairs == got, s"batch form disagrees: $batchPairs")
    } finally q.stop()
  }

  test("streaming transitions: a null-type event updates state — no stale-type resurrection") {
    import spark.implicits._
    import graft.streaming.EventStreams.{Transition, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = EventStreams.streamingTransitions(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("transitions_null")
      .outputMode(OutputMode.Append).start()
    try {
      // view | null | click across THREE batches: the null event must
      // overwrite the carried 'view', so the later click chains against
      // null (no pair) — exactly what the batch lag form produces on
      // [view, null, click]. Skipping the state update on a null-ending
      // batch would emit a phantom (view -> click).
      mem.addData(TypedEvent(9, ts(0), "view")); q.processAllAvailable()
      mem.addData(TypedEvent(9, ts(1), null)); q.processAllAvailable()
      mem.addData(TypedEvent(9, ts(2), "click")); q.processAllAvailable()
      val got = spark.table("transitions_null").as[Transition].collect()
        .map(t => (t.from_type, t.to_type)).toSet
      assert(got == Set(("view", null)), s"null-boundary transitions: $got")
    } finally q.stop()
  }

  test("streaming transitions: same-microsecond tie with a null type sorts nulls-first, no NPE") {
    import spark.implicits._
    import graft.streaming.EventStreams.{Transition, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = EventStreams.streamingTransitions(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("transitions_tie")
      .outputMode(OutputMode.Append).start()
    try {
      // carried state 'view', then a SAME-instant (null, "click") pair in
      // one batch: the tuple ordering used to call String.compareTo on the
      // null side of the tie and kill the query. Nulls-first means the
      // sequence is view | null | click -> (view -> null) emitted, the
      // null->click pair filtered, state ends at 'click'.
      mem.addData(TypedEvent(7, ts(0), "view")); q.processAllAvailable()
      mem.addData(TypedEvent(7, ts(1), null), TypedEvent(7, ts(1), "click"))
      q.processAllAvailable()
      mem.addData(TypedEvent(7, ts(2), "buy")); q.processAllAvailable()
      val got = spark.table("transitions_tie").as[Transition].collect()
        .map(t => (t.from_type, t.to_type)).toSet
      assert(got == Set(("view", null), ("click", "buy")),
        s"same-instant null tie transitions: $got")
    } finally q.stop()
  }

  test("streaming hourly-active dedups per (user, hour) and agrees with the batch HAU") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.streamingHourlyActive(df, "5 minutes")
      .writeStream.format("memory").queryName("hau_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: user 1 twice (dedup to one), user 2 once -> hau 2;
      // hour 1 (minute 70): user 1 again -> a NEW hour bucket counts it
      mem.addData((ts(1), 1L), (ts(5), 1L), (ts(7), 2L), (ts(70), 1L))
      q.processAllAvailable()
      mem.addData((ts(300), 9L)) // advance watermark: closes both hours
      q.processAllAvailable()
      import org.apache.spark.sql.functions.{col, date_format}
      val got = spark.table("hau_stream")
        .select(date_format(col("hour"), "HH:mm").as("h"), col("hau"))
        .as[(String, Long)].collect().toMap
      assert(got.values.toSeq.sorted == Seq(1L, 2L), s"window counts: $got")
    } finally q.stop()
  }

  test("streaming rolling window equals the batch deque kernel across micro-batch boundaries; stragglers drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{RollingOut, ValueEvent}
    // user 1 crosses the trailing-hour boundary mid-stream (minute 60
    // still sees minute 0 — inclusive lower bound; minute 61 drops it),
    // with same-timestamp PEERS (ids 3, 4) arriving in one batch; the
    // deque state must carry across the batch-B boundary for the
    // expiry to be computed against events emitted a batch earlier
    val evs = Seq(
      ValueEvent(1L, ts(0), 1L, 1.0000005),
      ValueEvent(1L, ts(30), 2L, -2.25),
      ValueEvent(1L, ts(60), 3L, 10.0),
      ValueEvent(1L, ts(60), 4L, 0.125),
      ValueEvent(1L, ts(61), 5L, 4.0),
      ValueEvent(1L, ts(1500), 6L, 7.5),
      ValueEvent(2L, ts(5), 7L, 3.5))
    val mem = MemoryStream[ValueEvent]
    val stream = EventStreams.streamingRolling(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("rolling_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(2): _*); stream.processAllAvailable()
      mem.addData(evs.slice(2, 5): _*); stream.processAllAvailable()
      mem.addData(evs.drop(5): _*); stream.processAllAvailable()
      // straggler strictly behind user 1's max seen time: dropped (its
      // frame pre-dates retained state — the debounce discipline)
      mem.addData(ValueEvent(1L, ts(70), 99L, 123.0)); stream.processAllAvailable()
      val streamed = spark.table("rolling_stream").as[RollingOut].collect()
        .map(o => o.event_id -> ((o.us, o.n_1h, o.sum_1h))).toMap
      assert(!streamed.contains(99L),
        "a straggler behind retained state is dropped, never misframed")
      val dir = java.nio.file.Files.createTempDirectory("rolling_batch").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, "view", e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_events_rolling")(spark, dir)
        .select("event_id", "us", "n_1h", "sum_1h")
        .as[(Long, Long, Long, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      SparkEntry.releaseCaches()
      assert(streamed == batch,
        s"stream must equal the batch kernel bit-for-bit on in-order input:\n$streamed\nvs\n$batch")
    } finally stream.stop()
  }

  test("streaming rolling: null users form one stream group, null values count-not-sum (batch parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{RollingOut, ValueEvent}
    // the r13 null-user axis contract: both engines' PARTITION BY puts
    // all null-user rows in ONE partition (so must the state store —
    // across micro-batches), and a null value counts toward n_1h but
    // not sum_1h, with sum NULL while the frame holds no non-null
    val evs = Seq(
      ValueEvent(null, ts(0), 1L, null),
      ValueEvent(null, ts(10), 2L, 5.5),
      ValueEvent(1L, ts(0), 3L, null),
      ValueEvent(1L, ts(5), 4L, 2.0),
      ValueEvent(null, ts(20), 5L, null))
    val mem = MemoryStream[ValueEvent]
    val stream = EventStreams.streamingRolling(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("rolling_null_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(2): _*); stream.processAllAvailable()
      mem.addData(evs.drop(2): _*); stream.processAllAvailable()
      val streamed = spark.table("rolling_null_stream").as[RollingOut].collect()
        .map(o => o.event_id ->
          ((o.us, o.n_1h, Option(o.sum_1h).map(_.doubleValue)))).toMap
      val dir = java.nio.file.Files.createTempDirectory("rolling_null_batch").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, "view", e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_events_rolling")(spark, dir)
        .select("event_id", "us", "n_1h", "sum_1h")
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      SparkEntry.releaseCaches()
      assert(streamed == batch,
        s"null contract must be batch-exact across micro-batches:\n$streamed\nvs\n$batch")
      // null-user frame at ts(10) holds {null, 5.5}: counted 2, summed 5.5
      assert(streamed(2L)._2 == 2L && streamed(2L)._3 == Some(5.5))
      // a frame holding only a null value: n=1, sum NULL
      assert(streamed(1L)._2 == 1L && streamed(1L)._3.isEmpty)
    } finally stream.stop()
  }

  test("streaming rolling survives huge values: no unscaled-Long throw, no sum overflow, batch-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{RollingOut, ValueEvent}
    // r12 ADVICE: state stored decimal(18,6) UNSCALED longs —
    // longValueExact threw past |v| ≈ 9.2e12 (killing the stream) and
    // the running Long sum could overflow a dense window. Fixture:
    // values around 1e15 plus a sign flip, split across micro-batches
    // so the huge entries live in carried state; must equal the batch
    // kernel (unbounded BigDecimal) bit-for-bit.
    val evs = Seq(
      ValueEvent(1L, ts(0), 1L, 9.3e12),
      ValueEvent(1L, ts(10), 2L, 1.25e15),
      ValueEvent(1L, ts(20), 3L, -8.5e14),
      ValueEvent(1L, ts(30), 4L, 0.333333),
      ValueEvent(1L, ts(3700), 5L, 2.0e15))
    val mem = MemoryStream[ValueEvent]
    val stream = EventStreams.streamingRolling(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("rolling_huge")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(2): _*); stream.processAllAvailable()
      mem.addData(evs.drop(2): _*); stream.processAllAvailable()
      val streamed = spark.table("rolling_huge").as[RollingOut].collect()
        .map(o => o.event_id -> ((o.n_1h, o.sum_1h))).toMap
      val dir = java.nio.file.Files.createTempDirectory("rolling_huge").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, "view", e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_events_rolling")(spark, dir)
        .select("event_id", "n_1h", "sum_1h").as[(Long, Long, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      SparkEntry.releaseCaches()
      assert(streamed == batch,
        s"huge values must flow through state exactly as in batch:\n$streamed\nvs\n$batch")
      assert(streamed(4L)._1 == 4L, "all four in-window entries present at ts 30")
      assert(streamed(5L) == ((1L, 2.0e15)), "the expired window resets cleanly")
    } finally stream.stop()
  }

  test("streaming EWMA agrees with the batch q_events_ewma bit-for-bit across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{EwmaOut, ValueEvent}
    // 20 events for one user (values 1..20, exercising the depth-16
    // truncation) plus a second user interleaved; split 7 / 9 / 4
    // across micro-batches so state must carry.
    val evs = (1 to 20).map(i =>
      ValueEvent(1L, ts(i), i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ValueEvent(2L, ts(i), 100L + i, 0.5 * i))
    val mem = MemoryStream[ValueEvent]
    val stream = EventStreams.streamingEwma(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(7): _*); stream.processAllAvailable()
      mem.addData(evs.slice(7, 16): _*); stream.processAllAvailable()
      mem.addData(evs.drop(16): _*); stream.processAllAvailable()
      val streamed = spark.table("ewma_stream").as[EwmaOut].collect()
        .map(o => o.event_id -> o.ewma).toMap
      // batch twin on the same rows written as an events table
      val dir = java.nio.file.Files.createTempDirectory("ewma_batch").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, "view", e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_events_ewma")(spark, dir)
        .select("event_id", "ewma").as[(Long, Double)].collect().toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, v) =>
        assert(v == batch(id), s"event $id: stream $v vs batch ${batch(id)}")
      }
    } finally stream.stop()
  }

  test("streaming backlog sweep-line state converges to the batch deltas across out-of-order splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{BacklogDelta, ShipEvent}
    // epoch-day intervals; order 2's close EXTENDS across batches
    // (correction pair), order 3 gets a ship day INSIDE its span
    // (no-op), order 4 arrives whole in the last batch
    val batch1 = Seq(ShipEvent(1, 100, 105), ShipEvent(2, 101, 110))
    val batch2 = Seq(ShipEvent(2, 101, 120), ShipEvent(3, 103, 115))
    val batch3 = Seq(ShipEvent(3, 103, 112), ShipEvent(4, 104, 108))
    val mem = MemoryStream[ShipEvent]
    val stream = EventStreams.streamingBacklogDeltas(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("backlog_deltas")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(batch1: _*); stream.processAllAvailable()
      mem.addData(batch2: _*); stream.processAllAvailable()
      mem.addData(batch3: _*); stream.processAllAvailable()
      // net the emitted deltas per day; a correction can zero a day out
      // (order 2's original close day 111) — batch has no row there
      val streamed = spark.table("backlog_deltas").as[BacklogDelta]
        .groupBy("day")
        .agg(sum("d_opened").as("n_opened"), sum("d_closed").as("n_closed"))
        .where(col("n_opened") =!= 0 || col("n_closed") =!= 0)
        .as[(Long, Long, Long)].collect().toSet
      // batch twin over the same intervals written as orders/lineitem
      val dir = java.nio.file.Files.createTempDirectory("backlog_batch").toString
      def day(d: Long) = java.time.LocalDate.ofEpochDay(d).toString
      val intervals = Seq((1L, 100L, 105L), (2L, 101L, 120L), (3L, 103L, 115L), (4L, 104L, 108L))
      intervals.map { case (o, od, _) => (o, day(od)) }
        .toDF("o_orderkey", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      // two lineitems per order, one at an interior day, one at close
      intervals.flatMap { case (o, od, cd) => Seq((o, day(od + 1)), (o, day(cd))) }
        .toDF("l_orderkey", "l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val batchRows = SparkEntry.queries("q_orders_backlog")(spark, dir)
        // batch day_i is days since 1992-01-01; the twin's day axis is epoch days
        .select((col("day_i") + lit(java.time.LocalDate.of(1992, 1, 1).toEpochDay))
          .cast("long").as("d"),
          col("n_opened"), col("n_closed"), col("backlog"))
        .as[(Long, Long, Long, Long)].collect()
      assert(batchRows.map(r => (r._1, r._2, r._3)).toSet == streamed,
        s"delta mismatch:\nbatch=${batchRows.toSeq.sortBy(_._1)}\nstream=${streamed.toSeq.sorted}")
      // and the day-axis cumsum over the streamed deltas IS the backlog
      val cum = streamed.toSeq.sortBy(_._1)
        .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, lvl), (d, o, c)) => (d, o, c, lvl + o - c) }
        .drop(1)
      assert(cum.toSet == batchRows.toSet, "cumulative backlog diverged")
    } finally stream.stop()
  }

  test("streaming stickiness (daily+monthly actives) equals the batch query bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // two months; users repeat within days (dedup) and across months;
    // sentinel in June advances the watermark past February so the
    // day windows finalize in append mode
    val evs = Seq(
      (1L, t("2024-01-05 10:00:00")), (1L, t("2024-01-05 11:00:00")),
      (2L, t("2024-01-05 12:00:00")), (1L, t("2024-01-06 09:00:00")),
      (3L, t("2024-01-07 09:00:00")), (2L, t("2024-02-02 09:00:00")),
      (2L, t("2024-02-02 18:00:00")), (4L, t("2024-02-02 19:00:00")),
      (2L, t("2024-02-03 08:00:00")), (5L, t("2024-02-04 08:00:00")))
    val sentinel = (99L, t("2024-06-01 00:00:00"))
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def stream(of: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String, mode: OutputMode) =
      of(mem.toDF().toDF("user_id", "ts"))
        .writeStream.format("memory").queryName(name).outputMode(mode).start()
    val dayQ = stream(EventStreams.streamingDailyActive(_, lateness = "60 days"),
      "stick_day", OutputMode.Append)
    val monQ = stream(EventStreams.streamingMonthlyActive(_, lateness = "60 days"),
      "stick_month", OutputMode.Update)
    try {
      mem.addData(evs.take(4): _*); dayQ.processAllAvailable(); monQ.processAllAvailable()
      mem.addData(evs.slice(4, 8): _*); dayQ.processAllAvailable(); monQ.processAllAvailable()
      mem.addData(evs.drop(8) :+ sentinel: _*)
      dayQ.processAllAvailable(); monQ.processAllAvailable()
      val byDay = spark.table("stick_day")
      // update sink appends every revision; counts only grow, so the
      // latest census per month is the max
      val byMonth = spark.table("stick_month")
        .groupBy("month").agg(max("mau").as("mau"))
      val streamed = EventStreams.stickinessFrom(byDay, byMonth)
        .where(col("month").isin("2024-01", "2024-02"))
        .as[(String, Long, Long, Long, Double)].collect().toSet
      val dir = java.nio.file.Files.createTempDirectory("stick_batch").toString
      (evs :+ sentinel).zipWithIndex
        .map { case ((u, time), i) => (i.toLong, time, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_events_stickiness")(spark, dir)
        .where(col("month").isin("2024-01", "2024-02"))
        .as[(String, Long, Long, Long, Double)].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"stickiness mismatch:\nbatch=$batch\nstream=$streamed")
    } finally { dayQ.stop(); monQ.stop() }
  }

  test("streaming PIT lookup equals the batch as-of decoration across splits (same-instant chains included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{PitOut, TypedIdEvent}
    // user 1: state chain with purchases between and AT changes —
    // including a same-instant chain (view -> purchase -> click at
    // t=10, ids 4,5,6): the purchase must read the instant's FINAL
    // state (click), the batch per-instant-collapse reading
    val evs = Seq(
      TypedIdEvent(1, 1, ts(0), "view"),
      TypedIdEvent(1, 2, ts(3), "purchase"),       // state purchase @3
      TypedIdEvent(1, 3, ts(7), "view"),
      TypedIdEvent(1, 4, ts(10), "view"),          // no change
      TypedIdEvent(1, 5, ts(10), "purchase"),      // change @10...
      TypedIdEvent(1, 6, ts(10), "click"),         // ...then click @10
      TypedIdEvent(1, 7, ts(20), "purchase"),      // state purchase @20
      TypedIdEvent(2, 8, ts(1), "purchase"),       // first event IS a purchase
      TypedIdEvent(2, 9, ts(5), "purchase"))       // no change since
    val mem = MemoryStream[TypedIdEvent]
    val stream = EventStreams.streamingPitLookup(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("pit_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(3): _*); stream.processAllAvailable()
      mem.addData(evs.slice(3, 7): _*); stream.processAllAvailable()
      mem.addData(evs.drop(7): _*); stream.processAllAvailable()
      val streamed = spark.table("pit_stream").as[PitOut].collect()
        .map(o => o.event_id -> ((o.state, o.state_age_us))).toMap
      val dir = java.nio.file.Files.createTempDirectory("pit_batch").toString
      evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_pit_state_lookup")(spark, dir)
        .select("event_id", "state", "state_age_us")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      SparkEntry.releaseCaches()
      assert(batch.nonEmpty && streamed == batch,
        s"PIT mismatch:\nbatch=$batch\nstream=$streamed")
    } finally stream.stop()
  }

  test("streaming leakage postings converge to the batch (source, gram) core; pair board reproduces the matrix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingGuards
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")   // one leaked 5-gram run
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ")   // in EVERY source
    val docs = Seq(
      (1L, "web", s"$shared unique web tail one two"),
      (2L, "books", s"$shared other continuation here now"),
      (3L, "code", s"$boiler code only body words here"),
      (4L, "web", s"$boiler and some more web words"),
      (5L, "books", s"$boiler books filler tokens go here"),
      (6L, "wiki", s"totally disjoint wiki text content here"))
    val mem = MemoryStream[(Long, String, String)]
    val stream = StreamingGuards.streamingLeakagePostings(
        mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("leak_postings")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(docs(0), docs(3)); stream.processAllAvailable()
      mem.addData(docs(1), docs(2)); stream.processAllAvailable()
      mem.addData(docs(4), docs(5)); stream.processAllAvailable()
      // latest row per key = the postings; presence = the batch sg set
      val postings = spark.table("leak_postings")
        .groupBy("source", "h").agg(max("occurrences").as("occurrences"))
        .persist()
      // the SAME df-guarded pair board the batch query runs (df 2..32);
      // re-root the lineage first — a self-join through the MemorySink
      // view trips Spark's conflicting-reference resolution (test-only
      // concern: a real deployment reads the sink table, not the plan)
      val sg = spark.createDataFrame(
        postings.select("source", "h").rdd, postings.select("source", "h").schema)
      val ok = sg.join(
          sg.groupBy("h").agg(count(lit(1)).as("sdf"))
            .where(col("sdf") >= 2 && col("sdf") <= 32), Seq("h"))
        .select("source", "h")
      val board = ok.as("a")
        .join(ok.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .as[(String, String, Long)].collect().toSet
      // batch twin over the same corpus as a documents table
      val dir = java.nio.file.Files.createTempDirectory("leak_batch").toString
      docs.map { case (id, src, text) => (id, text, "en", src, text.length) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val batch = SparkEntry.queries("pipe_leakage_matrix")(spark, dir)
        .as[(String, String, Long)].collect().toSet
      SparkEntry.releaseCaches()
      postings.unpersist()
      assert(batch.nonEmpty, "fixture must produce a non-empty matrix")
      assert(board == batch, s"leakage matrix mismatch:\nbatch=$batch\nstream=$board")
      // known row so the fixture can't rot into vacuity: books×web
      // share the two 5-grams of the leaked 6-token run PLUS the
      // boilerplate gram (df 3 ≤ cap, so it pairs all three carriers)
      assert(board.contains(("books", "web", 3L)), s"leaked-run row missing: $board")
    } finally stream.stop()
  }

  test("streaming span postings converge to the batch index; re-scoring reproduces dup_fraction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val para = (1 to 10).map(i => s"w$i").mkString(" ") // shared 10-token run
    val docs = Seq(
      (1L, para + " alpha beta"),              // shares spans with 2 and 3
      (2L, para + " alpha beta"),              // exact dup of 1
      (3L, "intro words " + para),             // shares the paragraph
      (4L, (1 to 12).map(i => s"u$i").mkString(" "))) // unique
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingDedup.streamingSpanPostings(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("span_postings")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(docs(0)); stream.processAllAvailable()
      mem.addData(docs(1), docs(2)); stream.processAllAvailable()
      mem.addData(docs(3)); stream.processAllAvailable()
      val streamedPostings = spark.table("span_postings")
        .groupBy("h").agg(max("docs_with").as("docs_with")) // counts only grow
      // batch twin over the same docs as a documents table
      val dir = java.nio.file.Files.createTempDirectory("span_batch").toString
      docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docSpans = Tables.documents(spark, dir)
        .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .where(size(col("t")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-8), i -> array_join(slice(t, i+1, 8), chr(1)))")).as("sp"))
        .select(col("doc_id"), graft.functions.PolyHash64Expr(col("sp")).as("h"))
        .distinct().persist()
      val batchPostings = docSpans.groupBy("h").agg(count(lit(1)).as("docs_with"))
      assert(streamedPostings.as[(Long, Long)].collect().toMap ==
        batchPostings.as[(Long, Long)].collect().toMap, "postings index diverged")
      // re-score against the STREAMED index == the batch query's output
      val rescored = docSpans.join(streamedPostings, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_spans"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_spans"), 6).as("dup_fraction"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = SparkEntry.queries("dedup_span_fraction")(spark, dir)
        .as[(Long, Long, Long, Double)].collect().toSet
      docSpans.unpersist()
      assert(batch == rescored, s"dup_fraction mismatch:\nbatch=$batch\nrescored=$rescored")
    } finally stream.stop()
  }
}
