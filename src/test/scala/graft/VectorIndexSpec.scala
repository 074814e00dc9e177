package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VectorIndex

/** Persisted IVF index: measured recall against the brute-force query
  * and an exchange-free probe of the stored cells. */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("probe recall vs brute force is measured and bounded; index never exchanges") {
    val vecs = Tables.embeddings(spark, sf)
    VectorIndex.build(spark, vecs, "vec_idx_test", k = 8, dim = 64, iters = 2)
    try {
    val queries = vecs.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probe = VectorIndex.probe(spark, queries, "vec_idx_test", k = 5, nprobe = 2)

    val got = probe.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val truth = SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    SparkEntry.releaseCaches()
    val recall = (got intersect truth).size.toDouble / truth.size
    // nprobe=2 of 8 cells scans ~25% of the corpus; the floor is a
    // measured regression pin, not a target (measured: 0.74 / 0.86 /
    // 0.92 / 0.94 at nprobe 1-4 with trained centers — vs 0.68 for the
    // label-column IVF query — so trained cells earn their keep)
    assert(recall >= 0.75, s"IVF recall@5 regressed: $recall")
    assert(got.size == truth.size, "probe returns a full top-k per query")

    // plan: the probe list broadcasts into the join, so the
    // corpus-proportional index side streams from disk unshuffled. Two
    // Exchanges remain — the nprobe-selection window (Q·k rows) and the
    // per-query top-k — and the top-k one is NOT the candidate slice:
    // a partial WindowGroupLimit below it prunes every map partition to
    // k rows per query before the shuffle.
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange\\b".r.findAllIn(p).map(identity).toSeq
    assert(exchanges.length == 2, s"only pruned subplans may exchange, got $exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin Inner BuildLeft"),
      s"the probe list must broadcast against the streamed index:\n$p")
    val steps = "\\((\\d+)\\) (Exchange|WindowGroupLimit)\\b".r.findAllMatchIn(p)
      .map(m => (m.group(1).toInt, m.group(2))).toSeq
    val lastExchange = steps.collect { case (n, "Exchange") => n }.max
    assert(steps.exists { case (n, kind) => kind == "WindowGroupLimit" && n < lastExchange },
      s"map-side rank limit must prune below the top-k exchange:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS vec_idx_test")
      spark.sql("DROP TABLE IF EXISTS vec_idx_test_centroids")
    }
  }
}
