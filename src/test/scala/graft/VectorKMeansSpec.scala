package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorKMeans

/** Pins the two properties VectorKMeans exists for: Lloyd convergence
  * (SSE monotone non-increasing) and bitwise run-to-run determinism
  * under different partitionings. */
class VectorKMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def embeddings = Tables.embeddings(spark, "/root/testdata/sf0.01")

  test("SSE is monotone non-increasing across Lloyd iterations") {
    val m = VectorKMeans.fit(embeddings, k = 8, dim = 64, iters = 4)
    assert(m.sse.length == 4)
    m.sse.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"SSE must not increase: ${m.sse}")
    }
    assert(m.sse.last < m.sse.head, "training must actually improve on this corpus")
  }

  test("centers are byte-identical regardless of input partitioning") {
    val a = VectorKMeans.fit(embeddings, k = 8, dim = 64, iters = 2)
    val b = VectorKMeans.fit(embeddings.repartition(7), k = 8, dim = 64, iters = 2)
    assert(a.centers.length == 8)
    (a.centers zip b.centers).foreach { case (ca, cb) =>
      assert(ca.toSeq == cb.toSeq, "exact-decimal means must be partitioning-invariant")
    }
    // assignments follow the centers
    val aa = a.assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bb = b.assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == bb)
  }

  test("every cluster is populated at k=8 on the test corpus") {
    val m = VectorKMeans.fit(embeddings, k = 8, dim = 64, iters = 2)
    val sizes = m.assign.groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.forall(_ > 0))
  }

  // --- fitBucketed (the dedup_semantic_kmeans trainer) ---

  private def bucketedFixture(rows: Seq[(Long, Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "bucket", "embedding")
  }

  test("fitBucketed iters=0 degenerates to the seed centroids (first k by vec_id, cast to double)") {
    val v = (1L to 5L).map(i => (i, 0L, Array.tabulate(4)(d => (i * 10 + d).toFloat)))
    val cents = VectorKMeans.fitBucketed(bucketedFixture(v), k = 2, iters = 0, trainCap = 0L)
      .collect().map(r => (r.getLong(1), r.getSeq[Double](2).toSeq)).toMap
    assert(cents.keySet == Set(1L, 2L), "seeds are the first k members by vec_id")
    assert(cents(1L) == Seq(10.0, 11.0, 12.0, 13.0) && cents(2L) == Seq(20.0, 21.0, 22.0, 23.0))
  }

  test("fitBucketed trainCap: the Lloyd update reads only each bucket's first cap members") {
    // k=1, one bucket, cap=2: the trained center must be the mean of
    // vec 1 and 2 ONLY — vec 3's far-away mass is outside the capped
    // training set (the semClusterCap discipline on the update side)
    val v = Seq(
      (1L, 0L, Array(0.0f, 0.0f)), (2L, 0L, Array(2.0f, 2.0f)),
      (3L, 0L, Array(1000.0f, 1000.0f)))
    val capped = VectorKMeans.fitBucketed(bucketedFixture(v), k = 1, iters = 1, trainCap = 2L)
      .head.getSeq[Double](2).toSeq
    assert(capped == Seq(1.0, 1.0), s"cap=2 must train on vecs 1+2 only, got $capped")
    val free = VectorKMeans.fitBucketed(bucketedFixture(v), k = 1, iters = 1, trainCap = 0L)
      .head.getSeq[Double](2).toSeq
    assert(free == Seq(334.0, 334.0), s"cap off must train on all three, got $free")
  }

  test("fitBucketed seeds from the TRAIN-CAPPED set when 0 < cap < k (the oracle's tr seeding)") {
    // r12 ADVICE: seeds came from the uncapped bucket ranking while the
    // DuckDB oracle seeds from tr (crn over the capped set) — silently
    // divergent whenever cap < k. With cap=2 < k=4, the seed set must
    // be exactly the two capped members, not four.
    val v = (1L to 5L).map(i => (i, 0L, Array.tabulate(4)(d => (i * 10 + d).toFloat)))
    val cents = VectorKMeans.fitBucketed(bucketedFixture(v), k = 4, iters = 0, trainCap = 2L)
      .collect().map(r => (r.getLong(1), r.getSeq[Double](2).toSeq)).toMap
    assert(cents.keySet == Set(1L, 2L),
      s"seeds must be tr's first min(k, cap) members by vec_id, got ${cents.keySet}")
    assert(cents(1L) == Seq(10.0, 11.0, 12.0, 13.0) && cents(2L) == Seq(20.0, 21.0, 22.0, 23.0))
  }

  test("fitBucketed keeps an emptied cluster's previous center (duplicate seeds tie to the lower id)") {
    // seeds 1 and 2 are identical vectors: every member (including
    // seed 2 itself) ties at distance 0 to both and assigns to the
    // LOWER cluster id, so cluster 2 empties — its center must persist
    // (standard Lloyd fallback), never NaN or vanish
    val v = Seq(
      (1L, 0L, Array(1.0f, 1.0f)), (2L, 0L, Array(1.0f, 1.0f)),
      (3L, 0L, Array(3.0f, 3.0f)))
    val cents = VectorKMeans.fitBucketed(bucketedFixture(v), k = 2, iters = 1, trainCap = 0L)
      .collect().map(r => (r.getLong(1), r.getSeq[Double](2).toSeq)).toMap
    assert(cents.keySet == Set(1L, 2L), "the emptied cluster must keep a row")
    assert(cents(2L) == Seq(1.0, 1.0), "emptied cluster retains its seed center")
    assert(cents(1L) == Seq(5.0 / 3, 5.0 / 3), "live cluster moves to the member mean")
  }

  test("fitBucketed trains every bucket independently in one pass") {
    val v = Seq(
      (1L, 7L, Array(0.0f, 0.0f)), (2L, 7L, Array(2.0f, 0.0f)),
      (10L, 9L, Array(100.0f, 0.0f)), (11L, 9L, Array(102.0f, 0.0f)))
    val cents = VectorKMeans.fitBucketed(bucketedFixture(v), k = 1, iters = 1, trainCap = 0L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2).toSeq)).toMap
    assert(cents == Map((7L, 1L) -> Seq(1.0, 0.0), (9L, 10L) -> Seq(101.0, 0.0)),
      s"per-bucket means must not bleed across buckets: $cents")
  }
}
