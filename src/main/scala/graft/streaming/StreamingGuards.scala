package graft.streaming

import java.sql.Timestamp

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Stateless ingest-time curation guards: the streaming twins of the
  * batch `pipe_decontaminate` / `pipe_quality_funnel` stages, sharing
  * their column kernels (wordNgrams / qualityCounters) so a document
  * gets the same verdict whether it arrives in a backfill or on the
  * live stream.
  *
  * Both guards are pure per-row maps — no watermark, no state store,
  * append-mode safe — which is exactly what an ingest edge wants: the
  * expensive corpus-level decisions (dedup, funnel accounting) happen
  * downstream in batch; the edge only TAGS, so late data can never
  * corrupt guard state.
  *
  * The eval n-gram set rides a driver broadcast: benchmark suites are
  * MBs even when the training corpus is 100 TB, the same envelope as
  * any broadcast dimension (at larger eval sets, swap the Set for a
  * Bloom filter — the call shape is unchanged, FPs become possible).
  */
object StreamingGuards {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Collect the distinct word-`n`-grams of an eval/benchmark corpus
    * into a driver set, ready to broadcast. Deliberate driver
    * materialization — size-gated for the same reason as the
    * embedding-cosine brute tier. */
  def evalGramSet(evalDocs: DataFrame, n: Int = 5, maxGrams: Int = 50000000): Set[String] = {
    // one job: fetch at most maxGrams+1 rows, so the gate both bounds
    // driver memory and avoids a separate count() recomputation
    val rows = evalDocs
      .select(tokens(coalesce(col("text"), lit(""))).as("ts"))
      .select(explode(array_distinct(wordNgrams(col("ts"), n))).as("s"))
      .distinct()
      .limit(maxGrams + 1)
      .collect()
    require(rows.length <= maxGrams,
      s"eval gram set exceeds $maxGrams grams: too large for a driver set; use a Bloom filter")
    rows.map(_.getString(0)).toSet
  }

  /** Tag each arriving document with its benchmark-overlap counts:
    * (n_grams, n_contaminated, clean). Same gram kernel as the batch
    * query; same counting rule (distinct grams, membership in the eval
    * set). */
  def decontaminationTag(docs: Dataset[Doc], evalGrams: Broadcast[Set[String]], n: Int = 5): DataFrame = {
    val hits = udf { (gs: Seq[String]) =>
      val ev = evalGrams.value
      gs.count(ev.contains).toLong
    }
    docs.toDF()
      // null text is a data condition, not a crash (same rule as the
      // multimodal wrap): coalesce to empty -> zero grams -> clean.
      // Tokens materialized pre-lambda, see CurationQueries.docGrams.
      .withColumn("toks", tokens(coalesce(col("text"), lit(""))))
      .withColumn("gs", array_distinct(wordNgrams(col("toks"), n)))
      .select(col("doc_id"), col("ts"),
        size(col("gs")).cast("long").as("n_grams"),
        hits(col("gs")).as("n_contaminated"))
      .withColumn("clean", col("n_contaminated") === 0L)
  }

  /** Tag each arriving document with the batch quality gate's verdict
    * (same `qualityCounters` kernel and thresholds as
    * `pipe_text_corpus`'s gate): token/stopword counts plus an accept
    * flag. */
  def qualityTag(docs: Dataset[Doc], minToks: Int = 10): DataFrame =
    docs.toDF()
      .withColumn("q", qualityCounters(col("text")))
      .select(col("doc_id"), col("ts"),
        col("q.n_toks").cast("long").as("n_toks"),
        col("q.n_stop").cast("long").as("n_stop"),
        (col("q.n_stop") > 0 && col("q.n_toks") >= minToks).as("accept"))
}
