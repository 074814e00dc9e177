package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.DedupQueries

/** Persistent semantic near-dup index: the storage half of
  * `dedup_semantic_incremental`, the way [[DedupIndex]] is the storage
  * half of `dedup_incremental`.
  *
  * The query form re-buckets the whole corpus on every run; at 100 TB
  * the history side is a TABLE built once and probed daily. `build`
  * writes the history corpus SRP-sign-bucketed (bucketBy on the bucket
  * key) plus a 1-row `<table>_meta` relation holding the quantizer
  * width — the width is derived from the HISTORY count at build time
  * and FROZEN (the `semBselFor` policy): every future batch buckets
  * with the index's width, so a growing ingest can never silently
  * re-bucket history. `probe` buckets the arriving batch with the
  * stored width and equi-joins per bucket; the stored corpus streams
  * from disk in its bucket layout and NEVER exchanges —
  * SemanticIndexSpec pins the pair set equal to the query form's
  * history slice and the probe plan exchange-free on the index side.
  *
  * The per-bucket history cap (`cap`, default the query form's
  * [[DedupQueries.semIncrCap]]) is applied at PROBE time by a window
  * that rides the bucketed table's own hash partitioning (no
  * exchange): capping at build time instead would bake today's cap
  * into the layout and silently change answers when the knob moves.
  */
object SemanticIndex {

  /** Drop `table` AND its default warehouse location. `mode(overwrite)`
    * alone is not crash-safe: a JVM that died mid-build leaves the
    * location directory on disk with no entry in the next session's
    * fresh in-memory catalog, and every later build then fails
    * LOCATION_ALREADY_EXISTS (r13: an aborted Verify run poisoned the
    * repo warehouse exactly this way). The default database maps to
    * the warehouse root, so the managed location is <warehouse>/<name>. */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Bucket `vecs` (vec_id, embedding) with the width the caps table
    * selects for THIS corpus size, and persist both. `fileBuckets` is
    * the physical bucketBy count — a layout choice sized to executor
    * memory, independent of the 2^bbits logical SRP buckets. */
  def build(spark: SparkSession, vecs: DataFrame, table: String,
      fileBuckets: Int = 16): Unit = {
    import spark.implicits._
    dropWithLocation(spark, table)
    dropWithLocation(spark, s"${table}_meta")
    val bits = DedupQueries.semBitsFor(vecs.count())
    vecs.select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), lit(bits), DedupQueries.semCoeffs,
          DedupQueries.Dim).as("bucket"))
      .write.mode("overwrite")
      .bucketBy(fileBuckets, "bucket").sortBy("bucket", "vec_id")
      .format("parquet")
      .saveAsTable(table)
    Seq(bits.toLong).toDF("bbits")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
  }

  /** Near-dup pairs (new_id, vec_id, sim >= threshold) of a new batch
    * against the stored index — the query form's `against = 'history'`
    * slice, computed without ever exchanging the stored corpus. NaN
    * (a zero vector's 0/0 cosine) is excluded exactly as in the query
    * form (the NanOrderingAuditSpec invariant). */
  def probe(spark: SparkSession, batch: DataFrame, table: String,
      cap: Long = DedupQueries.semIncrCap,
      threshold: Double = DedupQueries.CosineThreshold): DataFrame = {
    val b = batch.crossJoin(broadcast(spark.table(s"${table}_meta")))
      .select(col("vec_id").as("new_id"), col("embedding").as("nvec"),
        signBucket(col("embedding"), col("bbits"), DedupQueries.semCoeffs,
          DedupQueries.Dim).as("bucket"))
    // the cap window needs (bucket-clustered, vec_id-sorted) input —
    // exactly the bucketed table's layout, so it plans sort-only
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("vec_id").asc)
    val idx = spark.table(table)
    val capped =
      if (cap <= 0) idx
      else idx.withColumn("hrn", row_number().over(byBucket))
        .where(col("hrn") <= cap).drop("hrn")
    b.join(capped, "bucket")
      .select(col("new_id"), col("vec_id"),
        round(cosineLoop(col("nvec"), col("embedding"), DedupQueries.Dim), 6)
          .as("sim"))
      .where(!isnan(col("sim")) && col("sim") >= threshold)
  }
}
