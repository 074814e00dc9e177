package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof picks latest right <= left, inclusive, null when none") {
    val left = Seq((1L, 100L, 5L), (2L, 100L, 10L), (3L, 100L, 2L), (4L, 200L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 3L, "r3"), (100L, 10L, "r10"), (300L, 1L, "rx"))
      .toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, "k", "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("r3"),   // 5 >= 3, not yet 10
      2L -> Some("r10"),  // equality is inclusive
      3L -> None,         // before any right row
      4L -> None))        // key has no right rows at all
  }

  test("asof carries across multiple left rows after one right row") {
    val left = (1 to 5).map(i => (i.toLong, 1L, i * 10L)).toDF("id", "k", "t")
    val right = Seq((1L, 15L, "a"), (1L, 35L, "b")).toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, "k", "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("a"), 3L -> Some("a"),
      4L -> Some("b"), 5L -> Some("b")))
  }

  test("asof: a newer right row with a NULL payload beats a stale non-null one") {
    val left = Seq((1L, 1L, 40L)).toDF("id", "k", "t")
    val right = Seq((1L, 10L, Some("old")), (1L, 30L, None: Option[String]))
      .toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, "k", "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    // The t=30 right row is the as-of match; its payload is genuinely
    // null and must NOT be replaced by the stale t=10 value.
    assert(got == Map(1L -> None))
  }

  test("asof rejects payload names that collide with left columns") {
    val left = Seq((1L, 1L, 10L, "mine")).toDF("id", "k", "t", "v")
    val right = Seq((1L, 5L, "theirs")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "k", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("collide") || e.getMessage.contains("already exist"))
  }
}
