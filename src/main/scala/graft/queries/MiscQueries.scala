package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining engine-surface coverage: distinct aggregates (exact +
  * HyperLogLog), and the SQL string interface (`spark.sql`) over
  * registered views — a reference user gets the full declarative
  * surface, not just the DataFrame DSL.
  */
object MiscQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Exact distinct aggregation (expand + two-phase agg under AQE).
    "q_distinct_users" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),

    // HyperLogLog++ cardinality next to the exact answer (the 100 TB
    // path: one pass, constant memory, no expand). Approximate ->
    // rows-only check; the exact twin above is the oracle-graded one.
    "q_approx_distinct_users" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.01).as("n_users_approx"),
          countDistinct(col("user_id")).as("n_users_exact"))),

    // Deterministic train/test split (id-hash bucketing): every doc
    // lands in exactly one split, stable across runs and engines.
    "q_train_test_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          when(pmod(col("doc_id"), lit(10)) < 2, "test").otherwise("train").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("cnt"))),

    // Semi-structured JSON column: extract a field, bucket, aggregate
    // (the engine's schema-on-read path for the events props payload).
    "q_events_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"), expr("k div 10").as("k_decile"))
        .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))),

    // The same pricing summary through the SQL string interface.
    "q_sql_interface" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order
        FROM v_lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")
    }))

  override def oracles: Map[String, String] = Map(
    "q_train_test_split" ->
      """SELECT CASE WHEN doc_id % 10 < 2 THEN 'test' ELSE 'train' END AS split,
        |  lang, count(*) AS cnt
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "q_events_props" ->
      """SELECT event_type, CAST(props->>'k' AS INTEGER) // 10 AS k_decile,
        |  count(*) AS cnt, sum(CAST(props->>'k' AS INTEGER)) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sql_interface" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= '1998-09-02'
        |GROUP BY 1, 2""".stripMargin)
}
