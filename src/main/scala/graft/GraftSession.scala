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
