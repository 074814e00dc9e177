package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SemanticIndex

/** The persisted semantic index must give exactly the query-form
  * answers (dedup_semantic_incremental's history slice) with a probe
  * plan that never reshuffles the stored corpus — the [[DedupIndexSpec]]
  * contract, lifted to the embedding space. */
class SemanticIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("probe equals dedup_semantic_incremental's history slice; index side never exchanges") {
    val emb = Tables.embeddings(spark, sf)
    SemanticIndex.build(spark,
      emb.where(pmod(col("vec_id"), lit(2)) === 0), "sem_idx_hist")
    try {
      val probe = SemanticIndex.probe(spark,
        emb.where(pmod(col("vec_id"), lit(2)) === 1), "sem_idx_hist")
      val got = probe.select("new_id", "vec_id", "sim")
        .as[(Long, Long, Double)].collect().toSet
      val expected = SparkEntry.queries("dedup_semantic_incremental")(spark, sf)
        .where(col("against") === "history")
        .select("i", "j", "sim").as[(Long, Long, Double)].collect().toSet
      SparkEntry.releaseCaches()
      assert(got == expected,
        "persisted-index probe must equal the query form's history slice exactly")
      assert(got.nonEmpty, "sf0.01 has odd-vs-even semantic near-dups by construction")

      // physical plan: the history cap's window rides the bucketed
      // table's own hash partitioning (sort-only), and the bucket
      // equi-join broadcasts the small side — ZERO shuffle Exchanges
      // anywhere, so the stored corpus cannot have exchanged. (At real
      // batch sizes the join degrades to sort-merge and only the BATCH
      // shuffles, into the index's bucket scheme.)
      val p = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val exchanges = "\\(\\d+\\) Exchange\\b".r.findAllIn(p).length
      assert(exchanges == 0,
        s"daily probe must not shuffle at all (index bucketed, batch broadcast), got $exchanges:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"bucket equi-join should broadcast the small side:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sem_idx_hist")
      spark.sql("DROP TABLE IF EXISTS sem_idx_hist_meta")
    }
  }

  test("past the broadcast envelope only the BATCH exchanges — the stored corpus still never shuffles") {
    // the Scaladoc claim for real batch sizes, pinned: with broadcast
    // disabled the probe join degrades to sort-merge, the batch side
    // shuffles INTO the index's bucket scheme (exactly one Exchange),
    // and the index side still reads its bucketBy layout with no
    // Exchange anywhere above the scan — plus row-set equality with
    // the broadcast arm, so the routing never changes answers
    val emb = Tables.embeddings(spark, sf)
    SemanticIndex.build(spark,
      emb.where(pmod(col("vec_id"), lit(2)) === 0), "sem_idx_smj")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val bcRows = SemanticIndex.probe(spark,
          emb.where(pmod(col("vec_id"), lit(2)) === 1), "sem_idx_smj")
        .select("new_id", "vec_id", "sim")
        .as[(Long, Long, Double)].collect().toSet
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = SemanticIndex.probe(spark,
        emb.where(pmod(col("vec_id"), lit(2)) === 1), "sem_idx_smj")
      val got = probe.select("new_id", "vec_id", "sim")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == bcRows && got.nonEmpty,
        "join routing (broadcast vs sort-merge) must never change the pair set")
      val p = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val exchanges = "\\(\\d+\\) Exchange\\b".r.findAllIn(p).length
      assert(exchanges == 1,
        s"sort-merge arm: exactly ONE Exchange (the batch, into the bucket scheme):\n$p")
      assert(p.contains("SortMergeJoin"), s"broadcast disabled must yield sort-merge:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sem_idx_smj")
      spark.sql("DROP TABLE IF EXISTS sem_idx_smj_meta")
    }
  }

  test("the stored quantizer width is frozen at build time — a bigger batch still buckets with it") {
    // build over a tiny history (width = minimum bits), then probe a
    // batch LARGER than the history: if probe re-derived width from
    // its own side, identical vectors would land in different buckets
    // and the planted dup would silently vanish
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else 0.25f)
    // cos(a, w) ≈ 0.15 — fillers sit under the threshold even when a
    // bucket collides (asserted below so absence is the threshold's
    // doing, not luck)
    val w = Array.tabulate(64)(i => if (i % 3 == 0) -0.25f else 1.0f)
    val cosAw = {
      val dot = a.zip(w).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum * w.map(x => x.toDouble * x).sum)
    }
    assert(math.abs(cosAw) < 0.4, s"fixture invariant: filler cosine $cosAw under threshold")
    val hist = Seq(0L -> a).toDF("vec_id", "embedding")
    val batch = ((1 to 40).map(i => (2L * i + 1) -> w) :+
      (999L -> a)).toDF("vec_id", "embedding")
    SemanticIndex.build(spark, hist, "sem_idx_tiny")
    try {
      val bits = spark.table("sem_idx_tiny_meta").head.getLong(0)
      assert(bits == graft.queries.DedupQueries.semBitsFor(1L),
        "meta must hold the HISTORY-derived width")
      val got = SemanticIndex.probe(spark, batch, "sem_idx_tiny")
        .select("new_id", "vec_id").as[(Long, Long)].collect().toSet
      assert(got == Set((999L, 0L)),
        s"the planted copy must hit its history twin under the FROZEN width: $got")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sem_idx_tiny")
      spark.sql("DROP TABLE IF EXISTS sem_idx_tiny_meta")
    }
  }
}
