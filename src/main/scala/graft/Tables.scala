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

  /** Measure/money DOUBLE columns per table, sanitized at the read
    * boundary (NaN/±Inf ≡ NULL — the events-value contract, r14): a
    * garbage float must hit the ordinary SQL null semantics both
    * engines share (sums/avgs skip, filters drop, windows place NULLS
    * LAST under DESC on both) instead of crashing an ANSI decimal
    * cast or silently engaging each engine's own NaN ordering. Also
    * drives the oracle shadow CTEs ([[readBoundarySql]]). */
  private[graft] val measureCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders" -> Seq("o_totalprice"),
    "part" -> Seq("p_retailprice"),
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"))

  /** Full column lists for the shadow CTEs (projection order must
    * match the parquet schema so `SELECT *` consumers see the same
    * shape). */
  private val tableCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))

  /** Schema-aware (r14 VERDICT #1a): sanitize only columns the file
    * actually carries — narrow fixtures and pruned/projected datasets
    * are legitimate inputs, and an unconditional reference crashed
    * `Tables.lineitem` with UNRESOLVED_COLUMN on any parquet missing a
    * measure column. The implied raw-column predicates that keep these
    * CASEs pushdown-friendly are inferred by
    * [[graft.plans.SanitizedMeasurePushdown]]. */
  private def sanMeasures(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.schema.fieldNames.toSet
    cols.filter(present.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(isnan(col(c)) || abs(col(c)) === Double.PositiveInfinity,
          lit(null).cast("double")).otherwise(col(c)))
    }
  }

  private def measureTable(s: SparkSession, d: String, name: String): DataFrame =
    sanMeasures(table(s, d, name), measureCols(name))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = measureTable(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = measureTable(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = measureTable(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = measureTable(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = measureTable(s, d, "lineitem")
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

  /** The oracle-side mirrors of every read boundary: per-table CTEs
    * shadowing the base views (every reference in the oracle then
    * reads the sanitized relation). main.<t>: DuckDB refuses a CTE
    * that references a same-named view unqualified ("circular
    * reference"); the checker registers every table as a view in the
    * default `main` schema. */
  private def sanSql(c: String) =
    s"CASE WHEN isnan($c) OR isinf($c) THEN NULL ELSE $c END AS $c"
  private val boundaryCtes: Seq[(String, String)] =
    ("events",
      "events AS (SELECT event_id, ts, user_id, event_type, " +
        "CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS value, " +
        "props FROM main.events WHERE ts IS NOT NULL)") +:
      measureCols.toSeq.sortBy(_._1).map { case (t, mcols) =>
        val proj = tableCols(t)
          .map(c => if (mcols.contains(c)) sanSql(c) else c)
          .mkString(", ")
        t -> s"$t AS (SELECT $proj FROM main.$t)"
      }

  /** True when `sql` references `t` as a RELATION: the name in
    * FROM/JOIN position or as a comma-join list element — not any word
    * occurrence (r14 VERDICT #1c: the bare `\bt\b` match fired on the
    * strings 'customer'/'part' inside a vocab VALUES literal,
    * prepending an isnan-bearing shadow CTE to an oracle that reads
    * neither table and tripping NanOrderingAuditSpec's redundancy
    * check). Quoted occurrences never match: the `\s*` between the
    * FROM/JOIN/comma token and the name has no room for the opening
    * quote/paren. Still over-approximates on unquoted `, name` in a
    * SELECT/GROUP BY list — harmless, such a query references the
    * relation anyway or the unused CTE is inert. */
  private def referencesTable(sql: String, t: String): Boolean =
    s"(?is)(?:\\bfrom|\\bjoin|,)\\s*(?:main\\.)?$t\\b".r.findFirstIn(sql).isDefined

  /** Prefix `sql` with the shadow CTEs of every boundary table it
    * references. [[SparkEntry.oracleSql]] applies this to EVERY
    * oracle. */
  def readBoundarySql(sql: String): String = {
    val needed = boundaryCtes.collect {
      case (t, cte) if referencesTable(sql, t) => cte
    }
    if (needed.isEmpty) sql
    else {
      val chain = needed.mkString(",\n")
      if (sql.startsWith("WITH RECURSIVE "))
        "WITH RECURSIVE " + chain + ", " + sql.stripPrefix("WITH RECURSIVE ")
      else if (sql.startsWith("WITH "))
        "WITH " + chain + ",\n" + sql.stripPrefix("WITH ")
      else "WITH " + chain + "\n" + sql
    }
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
      // route through the boundary loaders so ad-hoc SQL sees the same
      // sanitized relations every DataFrame query (and every oracle
      // shadow CTE) sees — a raw temp view would silently diverge from
      // the oracle on a dirty corpus
      val df =
        if (n == "events") events(spark, sfDir)
        else if (measureCols.contains(n)) measureTable(spark, sfDir, n)
        else table(spark, sfDir, n)
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
