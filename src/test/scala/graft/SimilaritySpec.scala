package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ANN quality claims: IVF and SRP tiers against the
  * brute-force ground truth (all three queries are deterministic, so
  * these are fixed numbers, not flaky bounds). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def topkSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SRP-LSH recall@5 vs brute force clears the documented floor") {
    // the ranked kernel directly (the driver query wraps it in the
    // recall certificate; this pins the underlying list quality)
    val bf = topkSet("sim_topk_bruteforce")
    val srp = graft.queries.SimilarityQueries.srpTopK(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect srp).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall@5 regressed: $recall")
  }

  test("sim_topk_srp driver query emits a passing recall certificate") {
    val rows = SparkEntry.queries("sim_topk_srp")(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("floor_met") == 1L,
      s"SRP recall certificate failed: ${rows(0)}")
  }

  test("int8 scan + exact re-rank equals brute force exactly") {
    // Not just recall: the candidate margin (10x K) is meant to make the
    // quantized tier's OUTPUT identical to the exact one — the property
    // the shared DuckDB oracle grades. Pin it here too, with pairs.
    assert(topkSet("sim_topk_int8") == topkSet("sim_topk_bruteforce"))
  }

  test("int8 candidate plane survives a garbage flood wider than the candidate margin") {
    // r15 null01 known-red, reproduced as a fixture: more non-finite
    // vectors than Candidates(=50). Pre-fix, every garbage vector's
    // approx was NaN, NaN sorted FIRST under desc, candidacy flooded,
    // and the exact re-rank emitted all-NULL top-k. Post-fix the
    // garbage scale pins to NULL and desc_nulls_last evicts it from
    // candidacy, so the output equals brute force with finite sims.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = s"/tmp/graft_int8flood_${suiteName.hashCode}"
    def v(seed: Int): Array[Float] =
      Array.tabulate(64)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat)
    val real = (0L until 16L).map(id => (id, 0, v(id.toInt)))
    val garbage = (16L until 77L).map { id => // 61 > Candidates = 50
      val g = v(id.toInt)
      g(3) = (id % 3) match {
        case 0 => Float.PositiveInfinity
        case 1 => Float.NegativeInfinity
        case _ => Float.NaN
      }
      (id, 1, g)
    }
    (real ++ garbage).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val int8 = SparkEntry.queries("sim_topk_int8")(spark, dir).collect()
    val brute = SparkEntry.queries("sim_topk_bruteforce")(spark, dir).collect()
    SparkEntry.releaseCaches()
    assert(int8.forall(!_.isNullAt(2)), "garbage vectors re-entered the top-k")
    assert(
      int8.map(r => (r.getLong(0), r.getLong(1))).toSet ==
        brute.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "int8 top-k diverged from brute force under candidate flood")
  }

  test("IVF tier returns exact top-k within the probed cluster") {
    // every IVF hit must also rank in that cluster's brute-force order:
    // validated structurally — results are oracle-checked; here assert
    // the probe returns K rows per query (clusters are big enough).
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, sf)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(ivf.nonEmpty && ivf.forall(_ == 5L))
  }

  test("hard negatives: same-label excluded, near-copy ceiling binds, moderate cross-label ranks first") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val diag = Array.tabulate(64)(i => if (i <= 1) 1.0f else 0.0f)  // cos vs base = 1/√2
    val orth = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)  // cos vs base = 0
    val dir = s"/tmp/graft_hardneg_${suiteName.hashCode}"
    Seq(
      (0L, 0, base),            // anchor
      (1L, 0, diag),            // same label: NEVER a negative
      (2L, 1, base.map(_ * 2)), // cross-label exact copy: cos 1.0 ≥ ceiling, excluded
      (3L, 1, diag),            // cross-label, cos 1/√2: the hard negative, rank 1
      (4L, 1, orth)             // cross-label, cos 0: easy negative, rank 2
    ).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("sim_hard_negatives")(spark, dir)
      .where(col("qid") === 0L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toList
      .sortBy(_._3)
    SparkEntry.releaseCaches()
    assert(got == List((3L, 0.707107, 1), (4L, 0.0, 2)),
      s"anchor 0 must mine exactly the sub-ceiling cross-label vectors, got $got")
  }
}
