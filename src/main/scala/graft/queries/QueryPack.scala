package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries over the driver testdata plus their DuckDB
  * oracle SQL. [[graft.SparkEntry]] is the union of all packs.
  *
  * Contract (builder prompt): every Spark result column is aliased to the
  * SAME name in the oracle SQL — the driver compare sorts columns by name
  * before hashing. Queries with no SQL-expressible oracle simply omit the
  * entry (driver falls back to a rows-only check).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
