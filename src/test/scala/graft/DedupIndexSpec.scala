package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.DedupIndex

/** The persisted index must give exactly the query-form answers with a
  * probe plan that never reshuffles the stored corpus. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("probe equals dedup_incremental's history slice; index side never exchanges") {
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(docs.where(pmod(col("doc_id"), lit(2)) === 0), "dedup_idx_hist")
    try {
    val probe = DedupIndex.probe(spark,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), "dedup_idx_hist")

    val got = probe.select("new_id", "doc_id", "jac")
      .as[(Long, Long, Double)].collect().toSet
    val expected = SparkEntry.queries("dedup_incremental")(spark, sf)
      .where(col("against") === "history")
      .select("i", "j", "jac").as[(Long, Long, Double)].collect().toSet
    SparkEntry.releaseCaches()
    assert(got == expected, "persisted-index probe must equal the query form exactly")
    assert(got.nonEmpty, "sf0.01 has odd-vs-even near-dups by construction")

    // physical plan: at this batch size the optimizer broadcasts the
    // BATCH (BuildLeft), the index streams from disk unshuffled, and
    // the only Exchange is the final pair aggregation — the ideal
    // daily-probe plan. (A too-big batch degrades to sort-merge against
    // the bucketed index; the stored corpus still never exchanges.)
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange\\b".r.findAllIn(p).length
    assert(exchanges == 1, s"only the aggregation may exchange, got $exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin Inner BuildLeft"),
      s"small batch should broadcast against the streamed index:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS dedup_idx_hist")
  }
}
