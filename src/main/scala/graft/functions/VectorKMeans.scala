package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over `array<float>` embedding columns —
  * the trainer for centroid-bucketed operators (`dedup_semantic`'s
  * clusters, IVF cell lists). Two properties a curation pipeline needs
  * that MLlib's KMeans doesn't give:
  *
  *  - **Bitwise determinism independent of partitioning.** Per-cluster
  *    means are computed with exact DECIMAL sums (order-invariant),
  *    divided once, then cast to double — re-running on a differently
  *    partitioned corpus yields byte-identical centers, so a dedup keyed
  *    on cluster assignment is reproducible run-to-run.
  *  - **Deterministic seeding** (the k lowest-id vectors), not kmeans++
  *    sampling — seed choice is data, not RNG state.
  *
  * Iteration keeps centers on the DRIVER (k·dim doubles — the same
  * envelope as any broadcast dimension) and ships them into a
  * primitive-loop argmin kernel per pass; each pass is one scan + one
  * (cluster, pos) aggregation of decimal partials. Empty clusters keep
  * their previous center (standard Lloyd fallback), so k never shrinks.
  */
object VectorKMeans {

  /** @param sse    sum of squared L2 distances to the assigned center,
    *               one entry per iteration (monotone non-increasing)
    * @param assign (vec_id, cluster) at the final centers */
  case class KMeansModel(centers: Array[Array[Double]], sse: Seq[Double], assign: DataFrame)

  /** Argmin-by-L2 assignment against driver-held centers; ties break to
    * the lower cluster id (strict `<` while scanning ascending). */
  private def assignUdf(centers: Array[Array[Double]]) = udf { (v: Seq[Float]) =>
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var d = 0.0; var i = 0
      while (i < ctr.length) {
        val diff = v(i).toDouble - ctr(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def distUdf(centers: Array[Array[Double]]) = udf { (v: Seq[Float], c: Int) =>
    val ctr = centers(c)
    var d = 0.0; var i = 0
    while (i < ctr.length) { val diff = v(i).toDouble - ctr(i); d += diff * diff; i += 1 }
    d
  }

  private def assertDim(emb: org.apache.spark.sql.Column, dim: Int) = {
    val f = udf { (v: Seq[Float]) =>
      require(v != null && v.length == dim,
        s"embedding has ${if (v == null) "null" else v.length.toString} dims, expected $dim")
      true
    }
    f(emb)
  }

  def fit(vecs: DataFrame, k: Int, dim: Int, iters: Int = 3): KMeansModel = {
    require(k > 0 && iters > 0)
    // ragged embeddings fail HERE with a named reason, not as an
    // executor IndexOutOfBounds deep inside the argmin kernel
    val v = vecs.select(col("vec_id"), col("embedding"))
      .where(assertDim(col("embedding"), dim))

    // deterministic seeds: the k lowest-id vectors
    var centers: Array[Array[Double]] = v.orderBy("vec_id").limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(centers.length == k, s"need at least $k vectors to seed $k clusters")

    val sse = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val assigned = v.withColumn("cluster", assignUdf(centers)(col("embedding")))
      // SSE at the CURRENT centers (before the update), exact-decimal
      // summed for the same order-invariance as the means
      sse += assigned
        .select(distUdf(centers)(col("embedding"), col("cluster")).cast("decimal(28,12)").as("d"))
        .agg(sum(col("d")).cast("double")).head.getDouble(0)
      // per-(cluster, position) exact-decimal mean
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg((sum(col("x").cast("decimal(28,12)")) / count(lit(1)))
          .cast("double").as("m"))
        .collect()
      val next = Array.tabulate(k)(c => centers(c).clone()) // empty cluster keeps its center
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centers = next
    }
    val finalAssign = v.select(col("vec_id"),
      assignUdf(centers)(col("embedding")).cast("long").as("cluster"))
    KMeansModel(centers, sse.result(), finalAssign)
  }
}
