package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's core entity (reference:
  * /root/reference/src/scipi/src/main/java/publication/Publication.java:14-48
  * and the CQL DDL src/scripts/cassandraDB:9-22).
  *
  * Cassandra `set<text>` columns become `array<string>` with dedup
  * enforced at ingest; the timeuuid row id is a storage artifact the
  * relational model doesn't need (dedup key is (doi, title)). `year`
  * stays STRING — the reference validates it as exactly-4-chars text and
  * never does date arithmetic.
  */
case class Publication(
    doi: String,
    title: String,
    publisher: Option[String],
    venue: Option[String],
    lang: String,
    keywords: Seq[String],
    year: String,
    authors: Seq[String],
    fos: Seq[String],
    dataset: String)

object Publication {

  val schema: StructType = StructType(Seq(
    StructField("doi", StringType),
    StructField("title", StringType),
    StructField("publisher", StringType),
    StructField("venue", StringType),
    StructField("lang", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("year", StringType),
    StructField("authors", ArrayType(StringType)),
    StructField("fos", ArrayType(StringType)),
    StructField("dataset", StringType)))

  /** OAG JSON input shape (reference Gson deserializer
    * ScipiStream.java:260-376): authors are `[{"name": ...}]` objects,
    * keywords/fos plain string arrays, everything nullable. */
  val oagJsonSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("doi", StringType),
    StructField("lang", StringType),
    StructField("publisher", StringType),
    StructField("venue", StringType),
    StructField("year", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("authors", ArrayType(StructType(Seq(StructField("name", StringType))))),
    StructField("fos", ArrayType(StringType))))

  /** DBLP producer JSON shape (reference DblpParser.java:62-159):
    * `key` doubles as doi, `conference` as venue. */
  val dblpJsonSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("title", StringType),
    StructField("year", StringType),
    StructField("conference", StringType),
    StructField("authors", ArrayType(StringType))))

  /** P1: raw OAG JSON strings → publication-shaped rows (works on batch
    * and streaming DataFrames alike — `from_json` is a plain column op). */
  def fromOagJson(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), oagJsonSchema).as("j"))
      .select(
        col("j.doi").as("doi"),
        col("j.title").as("title"),
        col("j.publisher").as("publisher"),
        col("j.venue").as("venue"),
        col("j.lang").as("lang"),
        col("j.keywords").as("keywords"),
        col("j.year").as("year"),
        transform(col("j.authors"), a => a.getField("name")).as("authors"),
        col("j.fos").as("fos"),
        lit("oag").as("dataset"))

  /** P2: DBLP JSON → publication shape with the reference's constant
    * enrichment (keywords/fos = {"computer science"}, lang = "en";
    * ScipiStream.java:395-446). */
  def fromDblpJson(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), dblpJsonSchema).as("j"))
      .select(
        col("j.key").as("doi"),
        col("j.title").as("title"),
        lit(null).cast(StringType).as("publisher"),
        col("j.conference").as("venue"),
        lit("en").as("lang"),
        array(lit("computer science")).as("keywords"),
        col("j.year").as("year"),
        col("j.authors").as("authors"),
        array(lit("computer science")).as("fos"),
        lit("dblp").as("dataset"))
}
