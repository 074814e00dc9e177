package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorKMeans, VectorFunctions}
import graft.functions.VectorFunctions._

/** Persistent IVF index: the serving-path companion of the
  * `sim_topk_ivf` query, with REAL trained centroids instead of the
  * testdata's label column. `build` fits [[VectorKMeans]] (deterministic
  * Lloyd) and writes the assignments bucketed by cluster; `probe` scans
  * only each query's `nprobe` nearest cells.
  *
  * Probe plan shape (same logic as [[DedupIndex]]): the query batch +
  * its probe list broadcast, the cell-bucketed index streams from disk
  * unshuffled, and the only exchange is the per-query top-k window.
  * Recall is a function of `nprobe`/`k`: VectorIndexSpec measures it
  * against the brute-force query rather than assuming it.
  */
object VectorIndex {

  /** Squared L2 distance between a vector column and a center column
    * (unrolled, double math — same codegen posture as dotExpr). */
  private def l2Sq(v: Column, c: Column, dim: Int): Column =
    (0 until dim).map { i =>
      val d = v.getItem(i).cast("double") - c.getItem(i).cast("double")
      d * d
    }.reduce(_ + _)

  /** Fit k centers and persist `(vec_id, embedding, cluster)` bucketed
    * by cluster as `table`, plus the centers as `<table>_centroids`.
    * Returns the trained centers. */
  def build(spark: SparkSession, vecs: DataFrame, table: String,
      k: Int = 8, dim: Int = 64, iters: Int = 3, buckets: Int = 16): Array[Array[Double]] = {
    import spark.implicits._
    val model = VectorKMeans.fit(vecs, k, dim, iters)
    vecs.select(col("vec_id"), col("embedding"))
      .join(model.assign, "vec_id")
      .write.mode("overwrite")
      .bucketBy(buckets, "cluster").sortBy("cluster")
      .format("parquet")
      .saveAsTable(table)
    model.centers.zipWithIndex
      .map { case (ctr, c) => (c.toLong, ctr.toSeq) }.toSeq
      .toDF("cluster", "center")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
    model.centers
  }

  /** Top-`k` cosine neighbors per query vector, scanning only the
    * `nprobe` nearest cells of each query. `queries` needs columns
    * (qid, qvec). */
  def probe(spark: SparkSession, queries: DataFrame, table: String,
      k: Int = 5, nprobe: Int = 2, dim: Int = 64): DataFrame = {
    val cents = spark.table(s"${table}_centroids")
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2").asc, col("cluster").asc)
    // nprobe nearest cells per query — centroid table is k rows, the
    // whole selection is a broadcast-sized computation
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("qvec"), col("cluster"),
        l2Sq(col("qvec"), col("center"), dim).as("d2"))
      .withColumn("pr", row_number().over(byDist))
      .where(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("cluster"))
    val idx = spark.table(table)
    val bySim = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc_nulls_last, col("vec_id").asc)
    // the non-finite contract (r16 ranking-plane sweep): a zero-norm
    // side would THROW under ANSI's 0/0 and a NaN/±Inf component would
    // make sim NaN — which sorts ABOVE every finite sim under Spark's
    // NaN-greatest desc, handing garbage index rows the top-k (the
    // sim_topk_int8 candidate-flood class). guardedSim (ONE definition
    // with the query plane, r17) pins both to NULL; the norms are
    // projected as NAMED columns first so the guard's four references
    // each reuse one 64-term tree instead of inlining it four times —
    // the duplication class that pushed a fused stage past janino's
    // 64 KB method limit on the query plane.
    broadcast(probes).join(idx, "cluster")
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("qvec"), col("embedding"),
        normSqExpr(col("qvec"), dim).as("qn"),
        normSqExpr(col("embedding"), dim).as("en"))
      .select(col("qid"), col("vec_id"),
        guardedSim(dotExpr(col("qvec"), col("embedding"), dim),
          col("qn"), col("en")).as("sim"))
      // SERVING contract (r16 ADVICE): probe returns candidates only —
      // when a probed cell holds fewer than k finite vectors the
      // result is SHORT, never padded with guarded-NULL garbage ids
      // (the query plane keeps the opposite fill-ranks contract, which
      // its oracles mirror; a serving caller must never receive a
      // vec_id whose sim the guard voided)
      .where(col("sim").isNotNull)
      .withColumn("rank", row_number().over(bySim))
      .where(col("rank") <= k)
      .drop("rank")
  }
}
