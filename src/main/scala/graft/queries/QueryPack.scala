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

/** The one shared definition of TPC-H money math, used by every pack
  * that touches l_extendedprice/l_discount: exact DECIMAL end-to-end,
  * with only the FINAL shipped column cast to DOUBLE (re-scaled to
  * scale 4 first so the unscaled value stays < 2^53 and both engines'
  * decimal→double cast is one correctly-rounded division). Keeping a
  * single copy means a precision/scale fix cannot drift between packs.
  */
private[queries] object TpchMoney {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  def dec(c: Column): Column = c.cast("decimal(18,4)")
  def discPrice: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(1,0)") - dec(col("l_discount")))
  def ship(c: Column): Column = c.cast("decimal(38,4)").cast("double")

  val discPriceSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(18,4)))"
  def shipSql(e: String): String = s"CAST(CAST($e AS DECIMAL(38,4)) AS DOUBLE)"
}
