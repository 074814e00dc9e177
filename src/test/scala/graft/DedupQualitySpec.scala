package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the dedup sketch-quality claims against the exact ground truth
  * (all queries deterministic — fixed numbers, not flaky bounds). */
class DedupQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH + exact verify equals the exact Jaccard pairs") {
    assert(pairs("dedup_minhash_lsh") == pairs("dedup_ngram_jaccard"))
  }

  test("SimHash hamming bands recover nearly all true near-dup pairs") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import graft.functions.HashFunctions._
    val truth = pairs("dedup_ngram_jaccard")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), simhash(elementHashes(tokens(col("text")))).as("sh"))
    val chunks = docs.select(col("doc_id"), explode(simhashChunks(col("sh"))).as("cc"))
      .select(col("doc_id"), col("cc.chunk").as("chunk"), col("cc.value").as("value"))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect cand).size.toDouble / truth.size
    assert(recall >= 0.85, s"simhash candidate recall regressed: $recall")
    // and the banding stays selective: far fewer candidates than all pairs
    assert(cand.size < 5000, s"candidate explosion: ${cand.size}")
  }
}
