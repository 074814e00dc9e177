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

  def get(cores: Int = 4): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
