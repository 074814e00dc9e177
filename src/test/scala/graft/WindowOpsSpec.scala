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
}
