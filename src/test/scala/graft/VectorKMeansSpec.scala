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
}
