package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PairGen

/** Pins PairGen.suffixPairs as a drop-in for the legacy
  * explode×explode + `a < b` pair expansion: identical output
  * MULTISET on every array shape the kernels can meet (distinct sets,
  * duplicate values, empties, nulls, strings, a mega-array), while the
  * second Generate emits only the k(k-1)/2 suffix rows. */
class PairGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def legacy(df: org.apache.spark.sql.DataFrame, arr: String,
      a: String, b: String) =
    df.select(explode(col(arr)).as(a), col(arr))
      .select(col(a), explode(col(arr)).as(b))
      .where(col(a) < col(b))

  private def multiset(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Long] =
    df.collect().toSeq.groupBy(_.toSeq).map { case (k, v) => (k, v.size.toLong) }

  test("long arrays: distinct, duplicated, empty, null, singleton, mega") {
    import spark.implicits._
    val rows: Seq[Seq[java.lang.Long]] = Seq(
      Seq(3L, 1L, 2L),                       // unsorted distinct
      Seq(5L, 5L, 7L),                       // duplicate values
      Seq(9L),                               // singleton → no pairs
      Seq.empty[java.lang.Long],             // empty → no pairs
      null,                                  // null array → no rows
      (1L to 40L).map(Long.box).reverse,     // mega, reverse-sorted
      Seq(2L, 2L, 2L)                        // all-equal → no pairs
    )
    val df = rows.toDF("ps")
    val got = multiset(PairGen.suffixPairs(df, col("ps"), "a", "b"))
    val want = multiset(legacy(df, "ps", "a", "b"))
    assert(got == want, s"suffix pairs diverge from legacy: $got vs $want")
    // the mega row alone contributes 40*39/2 pairs — sanity that the
    // expansion really ran
    assert(want.values.sum >= 40L * 39 / 2)
  }

  test("string arrays (PubGraph coauthor shape) incl. duplicate authors") {
    import spark.implicits._
    val df = Seq(
      Seq("carol", "alice", "bob"),
      Seq("alice", "alice", "bob"),          // duplicate author in one list
      Seq("zed")
    ).toDF("authors")
    val got = multiset(PairGen.suffixPairs(df, col("authors"), "src", "dst"))
    val want = multiset(legacy(df, "authors", "src", "dst"))
    assert(got == want, s"$got vs $want")
    // the duplicate-author list must contribute (alice,bob) TWICE in
    // both forms — the filter drops only the equal-value pair
    assert(got.getOrElse(Seq("alice", "bob"), 0L) == 3L)
  }

  test("driver-SF kernel output unchanged: q_part_cooccur form at sf0.001") {
    import spark.implicits._
    import graft.queries.RelationalQueries
    val sf = "/root/testdata/sf0.001"
    val now = RelationalQueries.cooccurPairs(spark, sf, 1000)
      .as[(Long, Long, Long)].collect().toSet
    // legacy form inlined from the pre-r17 kernel
    val old = legacy(
      RelationalQueries.orderPartSets(spark, sf, 1000), "ps", "p1", "p2")
      .groupBy("p1", "p2").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(now == old)
  }
}
