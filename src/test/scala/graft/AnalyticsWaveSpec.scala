package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the round-8 analytics wave (count-of-counts,
  * cohort LTV, trailing-90d peak, compaction planning, MAD anomaly):
  * planted fixtures prove each operator catches what it claims to
  * catch — the DuckDB oracle only proves Spark and DuckDB agree. */
class AnalyticsWaveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft_wave_").toString

  private def ts(day: Int, sec: Int = 0): Timestamp =
    new Timestamp(24L * 3600 * 1000 * day + sec * 1000L)

  test("text_count_of_counts: hand-computed bigram spectrum") {
    val dir = fixtureDir()
    Seq((1L, "a b"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_count_of_counts")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "a b" occurs twice (1 type in bucket 2, mass 2); "c d" once.
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L))))
  }

  test("q_cohort_ltv: first-order year anchors the cohort; ages accumulate revenue") {
    val dir = fixtureDir()
    Seq(
      (1L, 100.0, Timestamp.valueOf("1992-03-01 00:00:00")),
      (1L, 50.0, Timestamp.valueOf("1994-07-01 00:00:00")),
      (2L, 10.0, Timestamp.valueOf("1992-11-20 00:00:00")))
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_cohort_ltv")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      (1992L, 0L) -> ((2L, 110.0)), // both customers' first-year orders
      (1992L, 2L) -> ((1L, 50.0)))) // customer 1, two years in
  }

  test("q_supplier_peak90: RANGE frame is gap-aware (a ROWS frame would double-count)") {
    val dir = fixtureDir()
    Seq(
      // supplier 1: two 10.0 sales 95 days apart — OUTSIDE the 90-day
      // window, so each day's trailing sum is 10; a ROWS-frame rolling
      // pair would read 20 at day 95. Peak ties at 10 → earliest day.
      (1L, 10.0, 0.0, ts(0)),
      (1L, 10.0, 0.0, ts(95)),
      // supplier 2: 50 days apart — inside the window, trailing sum 20.
      (2L, 10.0, 0.0, ts(0)),
      (2L, 10.0, 0.0, ts(50)))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_supplier_peak90")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // day_i is relative to 1992-01-01; ts(0) = 1970-01-01 = day −8035.
    assert(got(1L) == ((2L, -8035L, 10.0)), s"gap-aware trailing sum + earliest-day tie: ${got(1L)}")
    assert(got(2L) == ((2L, -8035L + 50L, 20.0)), s"in-window pair sums: ${got(2L)}")
  }

  test("pipe_compaction_plan: sequential start-offset packing, mass preserved") {
    val dir = fixtureDir()
    // six shards (distinct (source, lang)) with known sizes; total 240
    // → target = ceil-ish (240+5) div 6 = 40 bytes per bin.
    val shards = Seq(("s1", "en", 100L), ("s2", "en", 60L), ("s3", "en", 40L),
      ("s4", "en", 20L), ("s5", "en", 10L), ("s6", "en", 10L))
    shards.zipWithIndex.map { case ((src, lang, n), i) => (i.toLong, "x", lang, src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("pipe_compaction_plan")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // desc order: 100(start 0→bin 0), 60(100→2), 40(160→4), 20(200→5),
    // 10(220→5), 10(230→5)
    assert(got == Map(
      0L -> ((1L, 100L)), 2L -> ((1L, 60L)), 4L -> ((1L, 40L)),
      5L -> ((3L, 40L))), s"packing drifted: $got")
    assert(got.values.map(_._2).sum == 240L, "no shard lost or double-binned")
  }

  test("dedup_span_fraction: a shared 8-token run is caught; within-doc repeats are not cross-doc") {
    val dir = fixtureDir()
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    Seq(
      (1L, s"a1 a2 a3 $span a4"), // 12 tokens -> 5 windows, 1 shared
      (2L, s"b1 $span b2"),       // 10 tokens -> 3 windows, 1 shared
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"), // unique single window
      (4L, s"r1 r2 r3 r4 r5 r6 r7 r8 x r1 r2 r3 r4 r5 r6 r7 r8")) // self-repeat only
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_span_fraction")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((5L, 1L, 0.2)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, 0.333333)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, 0.0)), s"unique doc flags nothing: ${got(3L)}")
    // 17 tokens -> 10 windows, the repeated run's window deduplicates to
    // 9 distinct spans and none of them is cross-document
    assert(got(4L) == ((9L, 0L, 0.0)), s"within-doc repeat is not a dup: ${got(4L)}")
  }

  test("q_events_anomaly: a planted spike day is flagged; constant series stay silent") {
    val dir = fixtureDir()
    val rows =
      // type a: 10 quiet days of 2 events, day 11 spikes to 20
      (0 until 10).flatMap(d => Seq.tabulate(2)(i => (d * 100L + i, ts(d, i), 1L, "a", 0.0, ""))) ++
        Seq.tabulate(20)(i => (1100L + i, ts(11, i), 1L, "a", 0.0, ""))  ++
        // type b: perfectly constant — MAD 0, every deviation 0, no flags
        (0 until 5).map(d => (2000L + d, ts(d), 2L, "b", 0.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_events_anomaly")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("a", 20L, 2.0, 0.0)),
      s"exactly the spike day flags (median 2, MAD 0): ${got.toSeq}")
    SparkEntry.releaseCaches()
  }
}
