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

  /** Bucket-LOCAL distributed Lloyd — the trained-centroid upgrade of
    * `dedup_semantic`'s first-k-by-vec_id heuristic (r11 VERDICT #2),
    * in the shape that survives 100 TB: centers live in a DATAFRAME
    * keyed by (bucket, cluster) — never on the driver, never broadcast
    * — and every iteration refines ALL buckets' centers in one
    * distributed pass (assignment = bucket equi-join + per-vector
    * argmin over ≤k candidates; update = one (bucket, cluster, pos)
    * aggregation). Work per pass is O(N·k + N·dim); nothing grows
    * superlinearly and nothing depends on the bucket count.
    *
    * Cross-engine determinism (the committed-SRP discipline, extended
    * to trained floats): seeds are each bucket's first k members by
    * vec_id cast to double; distances are the [[VectorFunctions
    * .sqDistLoopD]] left-to-right chain (bit-replayable, tie → lower
    * cluster id); per-coordinate means sum members in vec_id order
    * left-to-right from +0.0 and divide once in double — DuckDB
    * replays the same order via `list(x ORDER BY vec_id)` +
    * `list_reduce`, so the trained centers, every assignment, and
    * every downstream cosine are bit-identical in both engines.
    * Empty clusters keep their previous center (standard Lloyd).
    *
    * `trainCap` bounds the per-bucket training membership (first cap
    * by vec_id — the semClusterCap discipline): adversarial mass piled
    * into one bucket caps the update-side state at O(cap·dim) per
    * cluster; assignment of the FULL corpus stays uncapped. */
  def fitBucketed(bucketed: DataFrame, k: Int, iters: Int, trainCap: Long): DataFrame = {
    require(k > 0 && iters >= 0)
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("vec_id").asc)
    val ranked = bucketed.select(col("vec_id"), col("bucket"), col("embedding"))
      .withColumn("trn", row_number().over(byId))
    // pinned (r17): tr is consumed by every iteration's assignment and
    // the seed derivation below — unpersisted, each reference re-ran
    // the bucket-ranking window over the whole corpus
    val tr = graft.CacheRegistry.persistTracked(
      (if (trainCap <= 0) ranked else ranked.where(col("trn") <= trainCap))
        .select("vec_id", "bucket", "embedding"))
    // Seeds come from the TRAIN-CAPPED set (first k of tr by vec_id ==
    // first min(k, cap) of the bucket ranking, since tr is a prefix of
    // the same ordering) — the oracle seeds from tr, so seeding from
    // the uncapped ranking silently diverged whenever 0 < cap < k
    // (r12 ADVICE; VectorKMeansSpec plants that arm).
    val seedCap = if (trainCap > 0 && trainCap < k) trainCap else k.toLong
    // each round's centers are (bucket × ≤k)-cardinality — tiny — but
    // cents_i references cents_{i−1} TWICE (the assignment join and the
    // empty-cluster fallback join), so the unpersisted recurrence
    // re-evaluated the whole earlier refinement 2^i times (r17)
    var cents = graft.CacheRegistry.persistTracked(
      ranked.where(col("trn") <= seedCap)
        .select(col("bucket"), col("vec_id").as("cluster"),
          transform(col("embedding"), x => x.cast("double")).as("cvec")))
    for (_ <- 1 to iters) {
      val assigned = assignBucketLocal(tr, cents)
      val means = assigned
        .select(col("bucket"), col("cluster"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select(col("bucket"), col("cluster"), col("pos"),
          struct(col("vec_id"), col("xf").cast("double").as("x")).as("vx"))
        .groupBy("bucket", "cluster", "pos")
        .agg((aggregate(sort_array(collect_list(col("vx"))), lit(0.0),
            (acc, s) => acc + s.getField("x")) /
          count(lit(1)).cast("double")).as("m"))
        .groupBy("bucket", "cluster")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mvec"))
      cents = graft.CacheRegistry.persistTracked(
        cents.join(means, Seq("bucket", "cluster"), "left")
          .select(col("bucket"), col("cluster"),
            coalesce(col("mvec"), col("cvec")).as("cvec")))
    }
    cents
  }

  /** Assign each vector to its bucket's nearest centroid by squared L2
    * (argmin via a per-vector window over the ≤k bucket-local
    * candidates — the semAssign shape), tie → lower cluster id.
    * Output keeps the winning centroid's coordinates for downstream
    * similarity scoring. */
  def assignBucketLocal(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("dist").asc, col("cluster").asc)
    vecs.join(cents, Seq("bucket"))
      .select(col("vec_id"), col("bucket"), col("cluster"), col("embedding"), col("cvec"),
        graft.functions.VectorFunctions.sqDistLoopD(col("embedding"), col("cvec")).as("dist"))
      .withColumn("rn", row_number().over(byDist))
      .where(col("rn") === 1)
      .select("vec_id", "bucket", "cluster", "embedding", "cvec")
  }
}
