package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining TPC-H decision-support shapes (Q2/Q8/Q9/Q11/Q12/Q14/
  * Q16/Q19/Q20/Q21 analogues), adapted to the driver schema: there is
  * no partsupp table, so the supplier-part relationship is the DISTINCT
  * (l_partkey, l_suppkey) pairs actually observed in lineitem, with
  * `s_acctbal` / `p_retailprice` standing in for supply cost, and no
  * commit/receipt dates, so "late" means shipped more than N days after
  * the order date. Together with [[TpchQueries]] this completes all 22
  * TPC-H query shapes.
  *
  * Decimal discipline is inherited from [[TpchQueries]]: money math
  * rides exact DECIMAL end-to-end and only the FINAL shipped column
  * casts to DOUBLE (re-scaled to scale 4 first so the cast is one
  * correctly-rounded division on both engines); doubles that feed
  * comparisons are produced by identical op sequences on both engines.
  */
object TpchDeepQueries extends QueryPack {

  import TpchMoney.{dec, discPrice, ship, discPriceSql, shipSql}

  override def queries: Map[String, Q] = Map(
    // Q8 analogue: a nation's market share — the fraction of one
    // region's revenue in one part type supplied by NATION_2, by order
    // year. Scale shape: the part-type filter broadcasts into lineitem
    // FIRST (cuts the fact ~6×), the supplier→nation name map
    // broadcasts next, and the ASIA customer key set (customer ⋈
    // nation ⋈ region, all broadcast among themselves) broadcasts into
    // the date-windowed orders scan — so the one lineitem⋈orders
    // shuffle moves only pre-cut rows. Numerator and denominator are
    // exact DECIMAL sums in the same aggregate; the share is one
    // double division, identical in DuckDB.
    "q8_market_share" -> ((s, d) => {
      val pt = broadcast(Tables.part(s, d)
        .where(col("p_type") === "STANDARD").select(col("p_partkey")))
      val supN = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val asiaCust = broadcast(Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey")))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(
          ship(sum(when(col("supp_nation") === "NATION_2", discPrice)
            .otherwise(lit(0).cast("decimal(18,4)")))).as("nation_volume"),
          ship(sum(discPrice)).as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          (col("nation_volume") / col("total_volume")).as("mkt_share"))
    }),

    // Q9 analogue: product-line profit by supplier nation and order
    // year, over parts matching a name substring. Profit per line =
    // disc. revenue − retailprice·quantity (the schema's stand-in for
    // ps_supplycost·quantity) — all exact DECIMAL until the final
    // shipped cast. Shape: name-filtered part broadcasts into lineitem
    // (the filter reaches the part scan), supplier→nation broadcasts,
    // and the one shuffle is lineitem⋈orders (orders pre-projected to
    // two columns).
    "q9_product_profit" -> ((s, d) => {
      val pz = broadcast(Tables.part(s, d)
        .where(col("p_name").contains("gizmo"))
        .select(col("p_partkey"), col("p_retailprice")))
      val supN = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(pz, col("l_partkey") === col("p_partkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(ship(sum(discPrice - dec(col("p_retailprice")) * dec(col("l_quantity"))))
          .as("profit"),
          count(lit(1)).as("n_lines"))
    }),

    // Q11 analogue: important parts — parts whose revenue exceeds a
    // corpus-RELATIVE threshold (1.5× the mean per-part revenue; a
    // fixed fraction like TPC-H's 0.0001 goes to zero rows as the part
    // count grows with SF). One lineitem shuffle (map-side partial
    // sums to one row per part); the 1-row global total/count
    // broadcasts back via crossJoin. The threshold comparison is pure
    // int64 on the DECIMAL's unscaled value (val > 1.5·tot/np ⟺
    // 2·val·np > 3·tot) — a double total would accumulate in
    // partition-dependent order and could flip a borderline part
    // between engines; integers cannot. (Envelope: the products stay
    // under 2^63 through ~sf100; the shipped `val` is one mirrored
    // unscaled/10⁴ double division.)
    "q11_important_parts" -> ((s, d) => {
      val v = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg((sum(discPrice).cast("decimal(38,4)") * 10000).cast("long").as("vu"))
      val t = v.agg(sum(col("vu")).as("tu"), count(lit(1)).as("np"))
      v.crossJoin(broadcast(t))
        .where(col("vu") * 2 * col("np") > col("tu") * 3)
        .select(col("l_partkey"), (col("vu").cast("double") / 10000.0).as("val"))
    }),

    // Q12 analogue: shipping-delay priority split — for lines shipped
    // in 1996 more than 30 days after their order date, count
    // high-priority vs low-priority orders per line status (the
    // schema's stand-in for ship mode). The ship-year filter reaches
    // the lineitem scan; orders projects to three columns before the
    // single equi-join shuffle; the late predicate (needs both sides)
    // rides the join output. CASE-sum aggregation, map-side combined.
    "q12_late_priority" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q14 analogue: promo revenue share in one month. part projects to
    // (key, is-promo flag) and broadcasts UNFILTERED — the share needs
    // every line's flag, so the cut happens on lineitem's pushed
    // ship-month filter instead. Both sums ride one aggregate over one
    // scan; the share is one double multiply-divide, mirrored exactly.
    "q14_promo_share" -> ((s, d) => {
      val pf = broadcast(Tables.part(s, d)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo")))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(pf, col("l_partkey") === col("p_partkey"))
        .agg(
          ship(sum(when(col("is_promo"), discPrice)
            .otherwise(lit(0).cast("decimal(18,4)")))).as("promo_revenue"),
          ship(sum(discPrice)).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share"))
    }),

    // Q2 analogue: best supplier per part — for mid-size LARGE parts,
    // the European supplier(s) with the highest account balance among
    // that part's observed suppliers (acctbal stands in for negated
    // supply cost). The correlated-max decorrelates to a window max,
    // NOT a groupBy + join-back: the join-back formulation recomputes
    // the whole pair subtree (two lineitem passes), the window does it
    // in ONE pass. Both dimension cuts broadcast into the scan, so the
    // window exchange on p_partkey moves only the already-cut pairs;
    // the winner dedup shuffles a per-part-sized set. The max-equality
    // comparison runs on the stored double (bit-identical on both
    // engines — no arithmetic). Top-100 is TakeOrdered.
    "q2_best_supplier" -> ((s, d) => {
      val pr = broadcast(Tables.part(s, d)
        .where(col("p_type") === "LARGE" && col("p_size").between(10, 20))
        .select(col("p_partkey")))
      val eur = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
      val wp = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(pr, col("l_partkey") === col("p_partkey"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"))
        .withColumn("best_bal", max(col("s_acctbal")).over(wp))
        .where(col("s_acctbal") === col("best_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("s_suppkey"))
        .distinct()
        .orderBy(col("s_acctbal").desc, col("p_partkey").asc, col("s_suppkey").asc)
        .limit(100)
    }),

    // Q16 analogue: distinct supplier count per (brand, type, size)
    // for a size set, excluding one brand, the PROMO type, and
    // suppliers with negative balance (the "complaints" stand-in).
    // There is no pre-distinct of (part, supplier) pairs: countDistinct
    // dedups inside the aggregate (Spark's two-phase distinct-agg), so
    // the only exchange is the group-key shuffle of the
    // already-broadcast-cut lineitem projection. The excluded-supplier
    // set is a broadcast LEFT ANTI on the scan side.
    "q16_supplier_counts" -> ((s, d) => {
      val pz = broadcast(Tables.part(s, d)
        .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 3, 9, 19, 23, 36, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
      val bad = broadcast(Tables.supplier(s, d)
        .where(col("s_acctbal") < 0).select(col("s_suppkey")))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(pz, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q19 analogue: disjunctive brand/size/quantity revenue. The three
    // OR-branches share a broadcast part join on partkey; the quantity
    // envelope (1..30, the union of the three branch ranges) is stated
    // explicitly so it reaches the lineitem scan as a pushed filter —
    // Catalyst does not extract the common range from the disjunction.
    // The branch predicate itself rides the joined rows.
    "q19_branded_revenue" -> ((s, d) => {
      val pz = broadcast(Tables.part(s, d)
        .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      Tables.lineitem(s, d)
        .where(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(pz, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(ship(sum(discPrice)).as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // Q20 analogue: European suppliers who shipped more than 45 units
    // of any 'small…' part in 1996 (the threshold picks the ~10% tail
    // of per-pair quantities at every SF). The part-name filter
    // broadcasts into the date-windowed lineitem scan; the
    // (part, supplier) quantity aggregate shuffles once (map-side
    // combine); the rare survivor key set broadcasts into the supplier
    // scan as a LEFT SEMI, so supplier never shuffles. Quantities are
    // integer-valued doubles — the sum is exact and the >45 cut
    // deterministic on both engines.
    "q20_heavy_suppliers" -> ((s, d) => {
      val pn = broadcast(Tables.part(s, d)
        .where(col("p_name").startsWith("small")).select(col("p_partkey")))
      val eurNat = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d).where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey")))
      val heavy = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(pn, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .where(col("q") > 45)
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(eurNat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // Q21 analogue: suppliers who kept orders waiting — in a finished
    // multi-supplier order, the ONLY supplier whose line shipped more
    // than 60 days after the order date. Exchange-reuse shape: after
    // the one lineitem⋈orders shuffle on orderkey, the per-(order,
    // supplier) late aggregate, the per-order window counts, AND the
    // window sort all ride the SAME hashpartitioning(orderkey) — zero
    // additional exchanges until the final small groupBy(suppkey).
    // The double-NOT-EXISTS of the original decorrelates to
    // "late = 1 ∧ suppliers ≥ 2 ∧ late-suppliers = 1".
    "q21_waiting_suppliers" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      val ord = Tables.orders(s, d)
        .where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          1L).otherwise(0L)).as("late"))
      perSupp
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nlate", sum(col("late")).over(w))
        .where(col("late") === 1 && col("nsupp") >= 2 && col("nlate") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(100)
    }))

  override def oracles: Map[String, String] = Map(
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${shipSql(s"sum(CASE WHEN n2.n_name = 'NATION_2' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS nation_volume,
         |  ${shipSql(s"sum($discPriceSql)")} AS total_volume,
         |  ${shipSql(s"sum(CASE WHEN n2.n_name = 'NATION_2' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END)")}
         |    / ${shipSql(s"sum($discPriceSql)")} AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
         |GROUP BY 1""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name, year(o_orderdate) AS o_year,
         |  ${shipSql(s"sum($discPriceSql - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)))")} AS profit,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%gizmo%'
         |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey,
         |    CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS vu
         |  FROM lineitem GROUP BY 1),
         |t AS (SELECT sum(vu) AS tu, count(*) AS np FROM v)
         |SELECT l_partkey, CAST(vu AS DOUBLE) / 10000.0 AS val
         |FROM v, t WHERE vu * 2 * np > tu * 3""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT
         |  ${shipSql(s"sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS promo_revenue,
         |  ${shipSql(s"sum($discPriceSql)")} AS total_revenue,
         |  100.0 * ${shipSql(s"sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END)")}
         |    / ${shipSql(s"sum($discPriceSql)")} AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'""".stripMargin,

    "q2_best_supplier" ->
      """WITH pairs AS (
        |  SELECT DISTINCT p_partkey, s_suppkey, s_name, s_acctbal, n_name
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20 AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey
        |FROM pairs p
        |WHERE s_acctbal = (SELECT max(s_acctbal) FROM pairs p2
        |                   WHERE p2.p_partkey = p.p_partkey)
        |ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC LIMIT 100""".stripMargin,

    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 3, 9, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q19_branded_revenue" ->
      s"""SELECT ${shipSql(s"sum($discPriceSql)")} AS revenue, count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_heavy_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |    GROUP BY l_partkey, l_suppkey HAVING sum(l_quantity) > 45)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH ls AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        |w AS (
        |  SELECT l_suppkey, late,
        |    count(*) OVER (PARTITION BY l_orderkey) AS nsupp,
        |    sum(late) OVER (PARTITION BY l_orderkey) AS nlate
        |  FROM ls)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM w JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND nsupp >= 2 AND nlate = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC LIMIT 100""".stripMargin)
}
