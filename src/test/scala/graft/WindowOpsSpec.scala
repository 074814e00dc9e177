package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the windowed time-series operators whose
  * arithmetic is subtle enough to deserve a fixture beyond the driver
  * oracle gate (which grades them against DuckDB on the real tables). */
class WindowOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("winops").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("q_events_rolling: the O(n) deque kernel equals the declarative RANGE frame exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // sharp edges: INCLUSIVE lower bound (ts 3600 still sees ts 0),
    // first expiry (ts 3601 drops ts 0, keeps 1800), same-timestamp
    // PEERS (both ts-3600 rows see each other — the RANGE semantic the
    // kernel must reproduce by emitting per (user, us) group), per-user
    // state reset, sub-6-dp rounding, negative values
    val dir = eventsDir(Seq(
      (1L, ts(0), 1L, "view", 1.0000005, "{}"),
      (2L, ts(1800), 1L, "view", -2.25, "{}"),
      (3L, ts(3600), 1L, "view", 10.0, "{}"),
      (4L, ts(3600), 1L, "view", 0.125, "{}"),
      (5L, ts(3601), 1L, "view", 4.0, "{}"),
      (6L, ts(90000), 1L, "view", 7.5, "{}"),
      (7L, ts(100), 2L, "view", 3.5, "{}")))
    val got = SparkEntry.queries("q_events_rolling")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    SparkEntry.releaseCaches()
    // the declarative frame the kernel replaced (O(n·w) per partition —
    // the r12 hot-user finding) stays here as the semantic reference
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    val ref = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,6)")).over(w)
          .cast("double").as("sum_1h"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == ref, s"kernel and RANGE frame must agree row-for-row:\n$got\nvs\n$ref")
    val byId = got.map(t => t._2 -> ((t._4, t._5))).toMap
    assert(byId(3L) == byId(4L) && byId(3L)._1 == 4L,
      "same-timestamp rows are PEERS: both ts-3600 rows see {0, 1800, 3600, 3600}")
    assert(byId(5L) == ((4L, 11.875)),
      "at ts 3601 the ts-0 row expired: {1800, 3600, 3600, 3601}, all-exact decimal sum")
    assert(byId(6L) == ((1L, 7.5)), "a far-future event's frame is itself")
    assert(byId(7L) == ((1L, 3.5)), "second user starts from clean deque state")
  }

  test("q_events_rolling: NULL values count in n_1h, skip sum_1h, and an all-null frame sums NULL") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // r12 ADVICE: the kernel's non-nullable decode THREW on a null
    // value, where the RANGE frame it replaced counted the row in
    // count(*) and skipped it in sum() — sum NULL when the frame holds
    // no non-null value. Fixture: user 1 mixes null among values
    // (count includes, sum skips), user 2 is ALL null (n_1h counts,
    // sum_1h stays NULL), user 3's null expires out of a later frame.
    val dir = java.nio.file.Files.createTempDirectory("winops_null").toString
    Seq[(Long, java.sql.Timestamp, Long, String, java.lang.Double, String)](
      (1L, ts(0), 1L, "view", 2.5, "{}"),
      (2L, ts(100), 1L, "view", null, "{}"),
      (3L, ts(200), 1L, "view", 4.0, "{}"),
      (4L, ts(0), 2L, "view", null, "{}"),
      (5L, ts(50), 2L, "view", null, "{}"),
      (6L, ts(0), 3L, "view", null, "{}"),
      (7L, ts(4000), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_events_rolling")(spark, dir)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(t => t._2 -> ((t._4, t._5))).toMap
    SparkEntry.releaseCaches()
    // the declarative frame is the null-semantics reference
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    val ref = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,6)")).over(w)
          .cast("double").as("sum_1h"))
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == ref, s"kernel must reproduce SQL null semantics:\n$got\nvs\n$ref")
    assert(got(2L) == ((2L, Some(2.5))), "null row counts, contributes nothing to the sum")
    assert(got(3L) == ((3L, Some(6.5))), "later frame still counts the null row")
    assert(got(5L) == ((2L, None)), "an all-null frame sums NULL, not 0")
    assert(got(7L) == ((1L, Some(1.0))), "the expired null leaves both count and sum")
  }

  test("q_events_rolling: kernel equals the declarative frame on the real sf0.01 table") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_events_rolling")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    SparkEntry.releaseCaches()
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    val ref = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,6)")).over(w)
          .cast("double").as("sum_1h"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got.size == ref.size && got == ref,
      s"kernel must reproduce the declarative frame on real data (${got.size} rows)")
  }

  test("q_events_ewma: weights 2^(m-1-j) renormalized by 2^m - 1, by hand") {
    // user 1: values 1, 2, 3 in time order.
    //   e1: m=1 -> 1/1 = 1
    //   e2: m=2 -> (2*2 + 1*1)/3 = 5/3
    //   e3: m=3 -> (3*4 + 2*2 + 1*1)/7 = 17/7
    val dir = eventsDir((1L to 3L).map(i =>
      (i, ts(i), 1L, "view", i.toDouble, "{}")))
    val got = SparkEntry.queries("q_events_ewma")(spark, dir)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0 && got(2L) == 5.0 / 3 && got(3L) == 17.0 / 7)
  }

  test("q_events_ewma: depth cap — the 17th event forgets the 1st entirely") {
    // user 2: first value 1000, then sixteen 0s. At event 16 the spike
    // sits at lag 15 (weight 1, denominator 2^16-1); at event 17 it has
    // aged out of the 16-deep window, so the EWMA snaps to exactly 0.
    val dir = eventsDir((1L to 17L).map(i =>
      (i, ts(i), 2L, "view", if (i == 1L) 1000.0 else 0.0, "{}")))
    val got = SparkEntry.queries("q_events_ewma")(spark, dir)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got(16L) == 1000.0 / 65535)
    assert(got(17L) == 0.0)
  }

  test("zero-denominator certificates: all-null hour (hau_approx) and all-null month (stickiness)") {
    // The r13 VERDICT #2 class: a group that EXISTS but whose every
    // user_id is NULL makes a distinct-count denominator zero, and the
    // unguarded 0/0 THROWS under ANSI mode (the pre-fix Verify dump on
    // the all-null-hour corpus died, not merely NULL-diverged).
    // nullify.py's first-hour arm grades the hau case on the driver
    // corpus; the all-null MONTH cannot be injected there (the corpus
    // spans one month), so this fixture pins it: January has real
    // users, February's are all NULL.
    def t(day: Int, month: Int, hour: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-$month%02d-$day%02d $hour%02d:00:00")
    val dir = java.nio.file.Files.createTempDirectory("winops_nullgrp").toString
    Seq[(Long, java.sql.Timestamp, java.lang.Long, String, java.lang.Double, String)](
      // Jan: two real users + one null user spread over two days
      (1L, t(1, 1, 0), 10L, "view", 1.0, "{}"),
      (2L, t(1, 1, 0), 11L, "view", 1.0, "{}"),
      (3L, t(2, 1, 5), 10L, "view", 1.0, "{}"),
      (4L, t(2, 1, 6), null, "view", 1.0, "{}"),
      // Feb: every user NULL, two days, two hours
      (5L, t(1, 2, 0), null, "view", 1.0, "{}"),
      (6L, t(1, 2, 3), null, "view", 1.0, "{}"),
      (7L, t(2, 2, 0), null, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val hau = SparkEntry.queries("q_events_hau_approx")(spark, dir)
      .select("hour", "hau_exact", "within_bound")
      .as[(String, Long, Long)].collect()
      .map { case (h, e, w) => h -> ((e, w)) }.toMap
    SparkEntry.releaseCaches()
    assert(hau("2024-02-01 00:00:00") == ((0L, 1L)),
      "an all-null hour answers hau_exact=0 with a vacuously-true certificate")
    assert(hau("2024-01-01 00:00:00") == ((2L, 1L)))
    assert(hau.size == 6, s"every hour group exists, null-only ones included: $hau")

    val st = SparkEntry.queries("q_events_stickiness")(spark, dir)
      .select("month", "n_days", "sum_dau", "mau", "stickiness")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    SparkEntry.releaseCaches()
    // Jan: day1 dau 2, day2 dau 1 (null user uncounted) -> 3/(2*2)
    assert(st("2024-01") == ((2L, 3L, 2L, Some(0.75))))
    // Feb exists, mau=0, stickiness pinned NULL (not 0/0)
    assert(st("2024-02") == ((2L, 0L, 0L, None)),
      s"an all-null month answers mau=0 with NULL stickiness: $st")

    // the streaming twins must agree on the same corpus: a null user
    // survives the (user, window) dedup as one row, and count(*) was
    // counting it as an active user where batch countDistinct excludes
    // it — count(user_id) skips the null while keeping the group
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.functions.{col, date_format, max}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Option[Long], java.sql.Timestamp)]
    val src = mem.toDF().toDF("user_id", "ts")
    val es = graft.streaming.EventStreams
    val hourQ = es.streamingHourlyActive(src, lateness = "60 days")
      .writeStream.format("memory").queryName("ndg_hour")
      .outputMode(OutputMode.Append).start()
    val dayQ = es.streamingDailyActive(src, lateness = "60 days")
      .writeStream.format("memory").queryName("ndg_day")
      .outputMode(OutputMode.Append).start()
    val monQ = es.streamingMonthlyActive(src, lateness = "60 days")
      .writeStream.format("memory").queryName("ndg_month")
      .outputMode(OutputMode.Update).start()
    try {
      val evs: Seq[(Option[Long], java.sql.Timestamp)] = Seq(
        (Some(10L), t(1, 1, 0)), (Some(11L), t(1, 1, 0)), (Some(10L), t(2, 1, 5)),
        (None, t(2, 1, 6)), (None, t(1, 2, 0)), (None, t(1, 2, 3)), (None, t(2, 2, 0)))
      // sentinel advances the watermark past February so append-mode
      // hour/day windows finalize
      val sentinel: (Option[Long], java.sql.Timestamp) =
        (Some(99L), java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      mem.addData(evs.take(4): _*)
      Seq(hourQ, dayQ, monQ).foreach(_.processAllAvailable())
      mem.addData(evs.drop(4) :+ sentinel: _*)
      Seq(hourQ, dayQ, monQ).foreach(_.processAllAvailable())
      val hourStream = spark.table("ndg_hour")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("h"), col("hau"))
        .where(col("h") < "2024-03").as[(String, Long)].collect().toMap
      assert(hourStream == hau.map { case (h, (e, _)) => h -> e },
        s"streaming HAU must match batch countDistinct null exclusion: $hourStream")
      val byMonth = spark.table("ndg_month")
        .groupBy("month").agg(max("mau").as("mau"))
      val streamed = es.stickinessFrom(spark.table("ndg_day"), byMonth)
        .where(col("month") < "2024-03")
        .select("month", "n_days", "sum_dau", "mau", "stickiness")
        .as[(String, Long, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(streamed == st, s"streaming stickiness twin diverged:\n$streamed\nvs\n$st")
    } finally { hourQ.stop(); dayQ.stop(); monQ.stop() }
  }
}
