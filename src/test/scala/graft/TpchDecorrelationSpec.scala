package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Semantic pins for the hand-decorrelated TPC-H shapes: the DataFrame
  * formulations shipped in TpchDeepQueries are proven equal, ON THE SAME
  * ENGINE, to the literal correlated-subquery SQL they decorrelate —
  * Spark plans the SQL through its own decorrelation rules, so the two
  * sides take different physical paths to the same rows. The DuckDB
  * oracle cannot pin this (it never sees the Spark-side rewrite); this
  * spec does. Runs at sf0.001.
  */
class TpchDecorrelationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  test("q2_best_supplier window-max == correlated scalar-max subquery") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, s_suppkey
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20 AND r_name = 'EUROPE'
        |  AND s_acctbal = (
        |    SELECT max(s2.s_acctbal)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC
        |LIMIT 100""".stripMargin).collect().toSeq
    val got = rows("q2_best_supplier")
    assert(got.nonEmpty, "q2 must produce winners at sf0.001")
    assert(got == sql, s"window-max drifted from the correlated subquery:\n got=$got\n sql=$sql")
  }

  test("q21_waiting_suppliers groupBy+window == literal double-NOT-EXISTS") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  JOIN orders ON l1.l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
        |    AND EXISTS (
        |      SELECT 1 FROM lineitem l2
        |      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (
        |      SELECT 1 FROM lineitem l3
        |      JOIN orders o2 ON l3.l_orderkey = o2.o_orderkey
        |      WHERE l3.l_orderkey = l1.l_orderkey
        |        AND l3.l_suppkey <> l1.l_suppkey
        |        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAYS)
        |) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC
        |LIMIT 100""".stripMargin).collect().toSeq
    val got = rows("q21_waiting_suppliers")
    assert(got.nonEmpty, "q21 must produce waiting suppliers at sf0.001")
    assert(got == sql, s"aggregate+window drifted from double-NOT-EXISTS:\n got=$got\n sql=$sql")
  }

  test("q4_order_priority max-shipdate semi join == literal correlated EXISTS") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect().toSeq
    val got = rows("q4_order_priority")
    assert(got.nonEmpty && got == sql,
      s"pre-aggregated semi join drifted from correlated EXISTS:\n got=$got\n sql=$sql")
  }
}
