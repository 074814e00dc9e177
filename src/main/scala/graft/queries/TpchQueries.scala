package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.AsofJoin

/** Classic decision-support shapes (TPC-H Q3/Q6/Q10 analogues) plus the
  * as-of join — point-in-time enrichment verified against DuckDB's
  * native ASOF JOIN.
  */
object TpchQueries extends QueryPack {

  import TpchMoney.{dec, discPrice, discPriceSql}

  override def queries: Map[String, Q] = Map(
    // Q3: top-10 open orders by potential revenue in a segment.
    "q3_shipping_priority" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .where(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_orderdate") < lit("1998-03-15") &&
          col("l_shipdate") > lit("1998-03-15"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        // exact DECIMAL sum, shipped as DOUBLE (driver hashes DuckDB
        // decimals as float64 — a DECIMAL output column can't hash-match).
        // Re-scaled to the true scale 4 first so the unscaled value stays
        // < 2^53 and both engines' decimal→double cast is one correctly-
        // rounded division. Both engines order by the same double,
        // tie-broken by key.
        .agg(sum(discPrice).cast("decimal(38,4)").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)),

    // Q6: forecast revenue change — single exact-decimal scan aggregate.
    // Q5 analogue: local-supplier volume — revenue per nation for one
    // region and year, counting only line items whose supplier sits in
    // the customer's own nation. The classic 6-way join: lineitem is
    // the only big table; orders shuffles once for the l⋈o equi-join
    // (pre-cut by the year filter); customer, supplier, nation, and the
    // region-filtered nation list all broadcast, with the region
    // predicate reaching the parquet scan. The c_nationkey=s_nationkey
    // "local" conjunct rides the supplier broadcast join.
    "q5_local_supplier" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey")))
      val supp = broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(Tables.nation(s, d))
      val reg = broadcast(Tables.region(s, d).where(col("r_name") === "ASIA"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice).cast("decimal(38,4)").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // Q10: top-20 customers by returned-item revenue.
    "q10_returned_items" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(discPrice).cast("decimal(38,4)").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)),

    // Q4 analogue: correlated EXISTS with an inequality on the outer row
    // (orders with any line shipped after the order date). Spark's
    // decorrelation target is a LEFT SEMI join carrying the extra
    // predicate — no per-row subquery execution, one shuffle pair.
    // (The testdata lineitem has no commit/receipt dates, so "late
    // shipment" stands in for TPC-H's commit-vs-receipt test.)
    // r3's 11.9 s outlier was the full-lineitem sort-merge semi. Two
    // scale fixes: (1) the order-date window implies l_shipdate >
    // window start (l_shipdate > o_orderdate ≥ '1996-01-01'), a static
    // filter Catalyst can't derive across the non-equi conjunct, so we
    // state it — it reaches the parquet scan as a pushed filter;
    // (2) EXISTS(line with shipdate > orderdate) ⟺ max(shipdate) per
    // order > orderdate, so pre-aggregate lineitem to one (orderkey,
    // last_ship) row — map-side combine collapses ~4 lines/order
    // before the exchange and the semi join probes a table the size of
    // orders, not lineitem.
    "q4_order_priority" -> ((s, d) => {
      val lastShip = Tables.lineitem(s, d)
        .where(col("l_shipdate") > lit("1996-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"))
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(lastShip,
          col("o_orderkey") === col("l_orderkey") &&
            col("last_ship") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q17 analogue: correlated scalar-aggregate subquery (lines under
    // 20% of their part's average quantity), decorrelated by hand into
    // a per-part aggregate joined back — the subquery runs once as a
    // grouped agg, not once per outer row. The brand filter broadcasts
    // into BOTH the probe scan and the average (a part's average is
    // unaffected by filtering on the part's own brand), so at scale the
    // heavy table is cut before any shuffle.
    // Determinism note: quantities are integer-valued doubles, so
    // sum/avg are exact in IEEE double and 0.2*avg is one correctly-
    // rounded multiply — identical in DuckDB.
    "q17_small_qty_revenue" -> ((s, d) => {
      val bparts = Tables.part(s, d)
        .where(col("p_brand") === "Brand#23").select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
      val cutoff = li.groupBy(col("l_partkey").as("c_pkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_cutoff"))
      li.join(broadcast(cutoff), col("l_partkey") === col("c_pkey"))
        .where(col("l_quantity") < col("qty_cutoff"))
        .agg((sum(dec(col("l_extendedprice"))).cast("decimal(38,4)")
          .cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // Q15 analogue: global-max scalar subquery — supplier(s) whose
    // quarterly revenue EQUALS the maximum. The equality runs on exact
    // DECIMALs (never compare doubles for selection!); only the shipped
    // column casts to DOUBLE. The 1-row max broadcasts, as does the
    // 100-row supplier dim — the revenue table shuffles once, on
    // l_suppkey, with map-side partial sums.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(discPrice).as("rev"))
      val top = rev.agg(max(col("rev")).as("maxrev"))
      rev.join(broadcast(top), col("rev") === col("maxrev"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("decimal(38,4)").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q7 analogue: volume shipping between two nations, either
    // direction, by ship year. Shape notes for 100 TB: BOTH big tables
    // are cut by a broadcast dimension join BEFORE the one
    // lineitem⋈orders shuffle — supplier(+nation pair) filters lineitem
    // to suppliers of the two nations, customer(+nation pair) filters
    // orders likewise, so the expensive equi-join shuffles ~2/25ths of
    // each side. The cross-pair disjunction (F→G or G→F) can only be
    // evaluated after both joins and rides the probe side for free.
    "q7_volume_shipping" -> ((s, d) => {
      val pairNames = Seq("NATION_1", "NATION_2")
      val pair = Tables.nation(s, d).where(col("n_name").isin(pairNames: _*))
      val supp = broadcast(Tables.supplier(s, d)
        .join(pair.select(col("n_nationkey"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation")))
      val cust = broadcast(Tables.customer(s, d)
        .join(pair.select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation")),
          col("c_nationkey") === col("nk2"))
        .select(col("c_custkey"), col("cust_nation")))
      val li = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(discPrice).cast("decimal(38,4)").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Q13 analogue: customer order-count distribution over a filtered
    // LEFT OUTER join (zero-order customers must appear). Scale shape:
    // orders pre-aggregates to (custkey, count) with map-side combine
    // BEFORE the outer join, so the custkey shuffle moves one row per
    // customer, not one per order; the final histogram is a few dozen
    // rows. The orderBy is total (n_custs desc, c_count desc), so the
    // result is deterministic.
    "q13_order_distribution" -> ((s, d) => {
      val ocnt = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ocnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("c_count").desc)
    }),

    // Q18 analogue: large-quantity orders (HAVING over a fact
    // aggregate, then decorate with the order/customer dims). Scale
    // shape: the only big shuffle is the lineitem groupBy (map-side
    // partial sums); the HAVING survivor set is rare by construction,
    // so it BROADCASTS into the orders scan, and that (still small)
    // result broadcasts into the customer scan — neither dimension
    // table ever shuffles. sum_qty is a sum of integer-valued doubles
    // (exact in IEEE), shipped as BIGINT.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .where(col("sum_qty") > 250)
      val ob = Tables.orders(s, d).join(broadcast(big),
        col("o_orderkey") === col("l_orderkey"))
      Tables.customer(s, d).join(broadcast(ob),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Q22 analogue: rich-but-inactive customers per segment — a global
    // scalar subquery (average positive balance) plus an anti join
    // against customers with recent orders. The 1-row cutoff broadcasts
    // via crossJoin; the anti-join build side pre-distincts to one row
    // per active customer (map-side combine) and then shuffles on
    // custkey — deliberately NOT hinted broadcast: at corpus scale most
    // customers are active, so the distinct key set is proportional to
    // customer, and AQE picks broadcast only when the SF makes it small.
    // Balance sums ride exact DECIMAL(18,2) and ship as DOUBLE; the
    // cutoff itself is one exact-sum→double division, identical on both
    // engines.
    "q22_inactive_customers" -> ((s, d) => {
      val dec2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
      val cut = Tables.customer(s, d).where(col("c_acctbal") > 0)
        .agg((sum(dec2(col("c_acctbal"))).cast("decimal(38,2)").cast("double") /
          count(lit(1))).as("cutoff"))
      val recent = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("2000-01-01"))
        .select(col("o_custkey")).distinct()
      Tables.customer(s, d)
        .crossJoin(broadcast(cut))
        .where(col("c_acctbal") > col("cutoff"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"),
          sum(dec2(col("c_acctbal"))).cast("decimal(38,2)").cast("double").as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // As-of join: each click enriched with the user's latest prior (or
    // simultaneous) signup event id.
    "q_events_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      AsofJoin.asof(clicks, signups, key = "user_id",
          leftTime = "ts", rightTime = "ts", payload = Seq("signup_id"))
        .select("event_id", "user_id", "signup_id")
    }))

  override def oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < '1998-03-15' AND l_shipdate > '1998-03-15'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         |GROUP BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($discPriceSql) AS rev
         |  FROM lineitem
         |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name,
         |  CAST(CAST(rev AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev = (SELECT max(rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
         |GROUP BY 1, 2, 3""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS n_custs FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY n_custs DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) b
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY sum_qty DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q22_inactive_customers" ->
      """WITH cut AS (
        |  SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
        |           / count(*) AS cutoff
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_bal
        |FROM customer, cut
        |WHERE c_acctbal > cutoff
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_asof" ->
      """SELECT l.event_id, l.user_id, r.signup_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN
        |  (SELECT event_id AS signup_id, user_id, ts FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)
}
