package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the conf we want on a real cluster,
  * scaled down for local[N].
  *
  *  - AQE on (runtime coalesce + skew-join split — directly relevant to
  *    the "computer science"-style hot keys in the co-occurrence joins,
  *    SURVEY.md §7.4-5).
  *  - shuffle.partitions sized to cores locally; on a 1000-executor
  *    cluster this is raised (or left to AQE's coalescing with a high
  *    initial partition number).
  *  - UTC so timestamp-derived columns match the DuckDB oracle.
  */
object GraftSession {

  /** Execute a query's FULL physical plan and return its row count —
    * the timing action for Bench/Soak/Probe. A bare `Dataset.count()`
    * lets Catalyst prune every column the count doesn't need, so a
    * query whose tail is a per-row Window/projection (q_events_rolling,
    * q_events_ewma) collapses to a parquet scan-count and the timing
    * measures I/O, not the operator (r12 finding: rolling read a flat
    * 0.29 s while its output grew 64× up the soak ladder). `toRdd`
    * executes the plan with its full output schema — every column
    * computed distributed, nothing shipped to the driver — which is
    * what "run the query" costs the consumer who writes the result
    * (Verify, the correctness gate, has always paid it: it writes
    * parquet). */
  def forceAll(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def builder(cores: Int = 4): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // per-process dir: the in-memory catalog dies with the JVM but the
      // location wouldn't, and a stale location fails the next CTAS
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")

  /** The conf profile for a real multi-executor deployment (not used by
    * the local harness; documents how the same code ships at 100 TB).
    * Shuffle partitions start high and AQE coalesces down; file split
    * and broadcast sizes are tuned for object-store parquet. */
  def clusterBuilder(): SparkSession.Builder =
    SparkSession.builder()
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", "2000")
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")

  def get(cores: Int = 4): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(s)
    s
  }
}
