package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Doc, NearDup}

/** Streaming MinHash-LSH near-dedup: bucket-mates compare by signature
  * agreement; unrelated docs never pair; state is watermark-bounded. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  // ~40 tokens so a one-token edit keeps jaccard ≈ 0.93
  private val baseText = (1 to 40).map(i => s"alpha$i beta$i").mkString(" ")
  private val editText = baseText.replace("alpha7", "zeta7")
  private val otherText = (1 to 40).map(i => s"gamma$i delta$i").mkString(" ")

  test("near-identical doc pairs with its original across micro-batches; unrelated never pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(mem.toDS(), threshold = 0.7)
      .writeStream.format("memory").queryName("near_dups")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, ts(0), baseText), Doc(2, ts(1), otherText))
      q.processAllAvailable()
      assert(spark.table("near_dups").isEmpty) // nothing similar yet
      mem.addData(Doc(3, ts(2), editText))     // near-dup of doc 1
      q.processAllAvailable()
      val pairs = spark.table("near_dups").as[NearDup].collect()
        .map(p => (p.doc_id, p.dup_of)).distinct // one emission per shared band
      assert(pairs.toSeq == Seq((3L, 1L)))
      val est = spark.table("near_dups").as[NearDup].collect().head.est_jaccard
      assert(est >= 0.7 && est <= 1.0)
    } finally q.stop()
  }

  test("within-batch near-dups are detected too, orientation newest->oldest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(mem.toDS(), threshold = 0.7)
      .writeStream.format("memory").queryName("near_dups_wb")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(10, ts(0), baseText), Doc(11, ts(1), editText))
      q.processAllAvailable()
      val pairs = spark.table("near_dups_wb").as[NearDup].collect()
        .map(p => (p.doc_id, p.dup_of)).distinct
      assert(pairs.toSeq == Seq((11L, 10L)))
    } finally q.stop()
  }

  test("stream agrees with the batch LSH sketch on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth under the SAME estimator: signature agreement >= 0.7
    import graft.functions.HashFunctions._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, baseText), (2L, otherText), (3L, editText)).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      minhashSignature(wordShingleHashes(col("text"), 3), 64).as("sig"))
    val batchPairs = sig.as("a").join(sig.as("b"), col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          eqv => eqv)) * 1.0 / 64).as("est"))
      .where(col("est") >= 0.7)
      .select("i", "j").as[(Long, Long)].collect().toSet

    val mem = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(mem.toDS(), threshold = 0.7)
      .writeStream.format("memory").queryName("near_dups_agree")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, ts(0), baseText), Doc(2, ts(1), otherText), Doc(3, ts(2), editText))
      q.processAllAvailable()
      val streamPairs = spark.table("near_dups_agree").as[NearDup].collect()
        .map(p => (p.doc_id, p.dup_of)).distinct.toSet
      assert(streamPairs == batchPairs)
    } finally q.stop()
  }

  test("maxPerBucket binds above threshold: a 68-doc identical flood keeps only the 64 newest bucket-mates") {
    // r16 knob audit: no corpus/arm at either graded SF ever exceeds
    // the 64-signature bucket cap, so its above-threshold behavior was
    // ungraded. 68 identical docs share every band bucket; newest-win
    // retention means doc 68 must pair against exactly docs 4..67 —
    // the 3 oldest have been evicted, bounding per-bucket state (and
    // the skew ceiling) at 64 regardless of flood size.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(mem.toDS(), bands = 1, threshold = 0.7)
      .writeStream.format("memory").queryName("near_dups_cap")
      .outputMode(OutputMode.Append).start()
    try {
      val docs = (1 to 68).map(i => Doc(i.toLong, ts(i), baseText))
      mem.addData(docs.take(40): _*); q.processAllAvailable()
      mem.addData(docs.drop(40): _*); q.processAllAvailable()
      val last = spark.table("near_dups_cap").as[NearDup].collect()
        .filter(_.doc_id == 68L).map(_.dup_of).toSet
      assert(last == (4L to 67L).toSet,
        s"doc 68 must see exactly the 64 newest mates, got ${last.size}: " +
          s"missing=${(4L to 67L).toSet -- last} extra=${last -- (4L to 67L).toSet}")
    } finally q.stop()
  }
}
