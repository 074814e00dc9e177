package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** P3-P5: the reference's validation/normalization layer as one pure
  * column pipeline (ScipiStream.java:218-257 scalar rules, 476-607
  * acceptance conjunction) — no UDFs, fully codegen'd, identical code
  * path for batch and streaming inputs.
  *
  * Divergence from the reference (documented, SURVEY.md §7.4): authors
  * are `array_sort`ed so downstream "author order" is deterministic
  * (the reference iterates a HashSet — nondeterministic).
  */
object Normalize {

  /** Scalar fields P3-normalized, array fields P4-normalized, then the
    * 7-condition acceptance filter (§1.3):
    * lang == "en"; doi, title, year, >= 1 author present; publisher OR
    * venue present; >= 1 keyword OR fos present; year exactly 4 chars. */
  def publications(df: DataFrame): DataFrame =
    df.select(
        normalizeStr(col("doi")).as("doi"),
        normalizeStr(col("title")).as("title"),
        normalizeStr(col("publisher")).as("publisher"),
        normalizeStr(col("venue")).as("venue"),
        normalizeStr(col("lang")).as("lang"),
        normalizeTopics(col("keywords")).as("keywords"),
        normalizeStr(col("year")).as("year"),
        array_sort(filter(transform(col("authors"), normalizeStr _), _.isNotNull))
          .as("authors"),
        normalizeTopics(col("fos")).as("fos"),
        col("dataset"))
      .where(
        col("lang") === "en" &&
          col("doi").isNotNull &&
          col("title").isNotNull &&
          (col("publisher").isNotNull || col("venue").isNotNull) &&
          (size(col("keywords")) > 0 || size(col("fos")) > 0) &&
          length(col("year")) === 4 &&
          size(col("authors")) > 0)

  /** S3's dedup contract: Cassandra upserts by partition key
    * (doi, title) — relationally, keep one row per key. */
  def dedupByKey(df: DataFrame): DataFrame =
    df.dropDuplicates("doi", "title")
}
