package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._

/** Persistent near-dup index: the storage half of `dedup_incremental`.
  *
  * The query form re-derives the corpus index on every run; at 100 TB
  * the index is a TABLE you build once and probe daily. `build` writes
  * the exploded shingle-hash index bucketed+sorted by hash, so `probe`
  * joins a new batch against it with NO exchange on the stored corpus,
  * in either regime the optimizer picks:
  *  - small daily batch (the common case): the BATCH broadcasts, the
  *    index streams bucket-by-bucket from disk — zero shuffle anywhere
  *    but the final pair aggregation;
  *  - batch too big to broadcast: sort-merge against the bucketed
  *    index — only the batch shuffles, into the index's bucket scheme.
  * DedupIndexSpec pins both halves: the probe's pair set equals the
  * query form's history slice exactly, and the physical plan contains
  * exactly one (aggregation) Exchange with the index side exchange-free.
  *
  * Layout notes:
  *  - Rows are (doc_id, h, n) with the doc's distinct-shingle count `n`
  *    DENORMALIZED onto every row: jaccard needs both set sizes at
  *    pair-scoring time, and carrying 8 bytes per row beats a second
  *    join against a sizes table at probe time.
  *  - Bucket count is a build-time choice (64 here ≈ a few GB per
  *    bucket at 10 B docs); a real deployment sizes it to executor
  *    memory and re-buckets only on major growth, like any bucketed
  *    fact table.
  */
object DedupIndex {

  /** Explode `docs` into the bucketed shingle-hash index table. */
  def build(docs: DataFrame, table: String, shingleN: Int = 3, buckets: Int = 64): Unit =
    docs
      .select(col("doc_id"), wordShingleHashes(col("text"), shingleN).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
      .write.mode("overwrite")
      .bucketBy(buckets, "h").sortBy("h")
      .format("parquet")
      .saveAsTable(table)

  /** Near-dup pairs (new_id, doc_id, jac >= threshold) of a new batch
    * against the stored index. The index side streams bucket-aligned
    * from disk; only the batch's exploded shingles shuffle. */
  def probe(spark: SparkSession, newDocs: DataFrame, table: String,
      shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = newDocs
      .select(col("doc_id").as("new_id"), wordShingleHashes(col("text"), shingleN).as("hs"))
      .where(size(col("hs")) > 0)
    val ex = sh.select(col("new_id"), size(col("hs")).as("new_n"), explode(col("hs")).as("h"))
    val idx = spark.table(table)
    val jac = round(col("c").cast("double") / (col("new_n") + col("n") - col("c")), 6)
    ex.join(idx, "h")
      .groupBy(col("new_id"), col("doc_id"), col("new_n"), col("n"))
      .agg(count(lit(1)).as("c"))
      .select(col("new_id"), col("doc_id"), jac.as("jac"))
      .where(col("jac") >= threshold)
  }
}
