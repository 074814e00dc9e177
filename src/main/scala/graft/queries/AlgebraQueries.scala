package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.functions.GeoMean

/** Relational-algebra breadth the reference never needed but a
  * complete engine surface includes: pivot, EXCEPT, semi/anti joins,
  * and a typed-Aggregator UDAF. Semi/anti joins never materialize the
  * probe side's payload — at scale they beat IN-subquery rewrites by
  * shuffling only the join keys.
  */
object AlgebraQueries extends QueryPack {

  /** The wide per-year status-count table behind BOTH reshape twins —
    * one definition so the pivot and its documented inverse cannot
    * drift apart. */
  private val Statuses = Seq("F", "O", "P")
  private def wideStatusCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderstatus", Statuses)
      .count()
      .select(col("o_year") +:
        Statuses.map(st => coalesce(col(st), lit(0L)).as(st)): _*)

  override def queries: Map[String, Q] = Map(
    // Pivot: order counts per year x status.
    "q_pivot_status" -> ((s, d) => wideStatusCounts(s, d)),

    // UNPIVOT (melt) — the inverse reshape of q_pivot_status: the wide
    // per-year status counts fold back to long (o_year, status, cnt)
    // rows via stack(). Wide→long is a pure map-side Expand — zero
    // additional shuffles beyond the aggregate that built the wide
    // table, which is the reason to unpivot AFTER aggregating rather
    // than re-grouping the fact table a second time.
    "q_unpivot_status" -> ((s, d) =>
      wideStatusCounts(s, d)
        .select(col("o_year"),
          expr("stack(3, 'F', F, 'O', O, 'P', P) AS (status, cnt)"))),

    // Keep-latest compaction (SCD-1 / CDC snapshot): one surviving row
    // per key — the user's LATEST event by (ts, event_id) — via a
    // row_number window over the key partitioning. One shuffle on the
    // key; the tie-break on event_id makes the survivor deterministic
    // under any partitioning (ts alone can collide).
    "pipe_latest_snapshot" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event"),
          col("event_type").as("last_type"))
    }),

    // SCD-2 companion to the SCD-1 snapshot above: the full state
    // HISTORY as validity intervals. A row opens whenever the user's
    // event_type changes (or at the first event); valid_to is the next
    // change's valid_from, −1 while still open (integer sentinel, not
    // NULL, per the output-type policy). Change detection and the
    // closing lead() ride the SAME user_id hash partitioning — Filter
    // preserves distribution, so the whole history is one exchange,
    // plan-asserted.
    "pipe_scd2_history" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("event_type", 1).over(byUser))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", coalesce(lead("us", 1).over(byUser), lit(-1L)))
        .select(col("user_id"), col("event_type").as("state"),
          col("us").as("valid_from"), col("valid_to"))
    }),

    // Point-in-time feature lookup — the feature-store join that
    // prevents training leakage: each purchase decorated with the
    // user's SCD-2 state IN FORCE at purchase time (never a later
    // state). Dimension side = the same change rows pipe_scd2_history
    // opens intervals on, collapsed to one row per (user, instant)
    // with the LAST change winning (the zero-length-interval reading;
    // min-of-(−id) argmax, combinable). The lookup itself is the
    // AsofJoin kernel — union + ONE user_id window pass, never a
    // probe × versions fanout — so a hyper-user costs their event
    // count, not events × state-changes. state_age_us (how stale the
    // feature was at use) rides along for free.
    "q_pit_state_lookup" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val ev = graft.CacheRegistry.persistTracked(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us")))
      val changes = ev
        .withColumn("prev", lag("event_type", 1).over(byUser))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .groupBy(col("user_id"), col("us").as("cus"))
        .agg(min(struct((-col("event_id")).as("nid"),
          col("event_type").as("t"))).as("m"))
        .select(col("user_id"), col("cus"), col("m.t").as("state"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      graft.functions.AsofJoin.asof(buys, changes, key = "user_id",
          leftTime = "us", rightTime = "cus", payload = Seq("state", "cus"))
        // the oracle is an INNER asof — unmatched purchases (a NULL
        // user_id can match no change row) must drop. The matched
        // flag is cus, NOT state: a matched state can be legitimately
        // NULL (the null-event_type axis arm), but cus is non-null
        // for every real match. (r13 null-user axis catch.)
        .where(col("cus").isNotNull)
        .select(col("event_id"), col("user_id"), col("state"),
          (col("us") - col("cus")).as("state_age_us"))
    }),

    // Incremental aggregate maintenance — the materialized-view merge
    // pattern: per-user stats are computed on two disjoint event
    // slices (the "history state" and the "new delta"), then MERGED
    // (counts add, exact-decimal sums add, min/least and max/greatest
    // combine) instead of recomputing history. The oracle is the
    // ONE-PASS aggregate over everything — grading the merge operation
    // itself. At 100 TB this is the only affordable shape for a
    // standing aggregate: cost ∝ delta + state cardinality, and every
    // aggregate here is decomposable (count/sum/min/max; the HLL and
    // CMS tiers elsewhere merge the same way).
    "pipe_incremental_agg" -> ((s, d) => {
      def half(pred: org.apache.spark.sql.Column) =
        Tables.events(s, d).where(pred)
          .groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,6)")).as("sumv"),
            min(unix_micros(col("ts"))).as("mn"),
            max(unix_micros(col("ts"))).as("mx"))
      val cut = lit("2024-03-01").cast("timestamp")
      val a = half(col("ts") < cut)
      val b = half(col("ts") >= cut)
      a.as("a").join(b.as("b"), col("a.user_id") === col("b.user_id"), "full_outer")
        .select(
          coalesce(col("a.user_id"), col("b.user_id")).as("user_id"),
          (coalesce(col("a.cnt"), lit(0L)) + coalesce(col("b.cnt"), lit(0L))).as("n_events"),
          (coalesce(col("a.sumv"), lit(0).cast("decimal(18,6)")) +
            coalesce(col("b.sumv"), lit(0).cast("decimal(18,6)")))
            .cast("double").as("sum_value"),
          least(coalesce(col("a.mn"), col("b.mn")), coalesce(col("b.mn"), col("a.mn"))).as("first_us"),
          greatest(coalesce(col("a.mx"), col("b.mx")), coalesce(col("b.mx"), col("a.mx"))).as("last_us"))
    }),

    // MERGE / CDC apply — the missing third of the warehouse-change
    // family (snapshot-diff DERIVES a feed, incremental-agg maintains
    // an aggregate; this APPLIES a feed to a table): the pre-cut
    // keep-latest state per user is the target, the post-cut slice is
    // the source, and the merge semantics are the standard three-arm
    // MERGE — WHEN MATCHED AND tombstone THEN DELETE (an 'error' as
    // the user's latest source event), WHEN MATCHED THEN UPDATE,
    // WHEN NOT MATCHED THEN INSERT. Both sides reduce to one row per
    // user with the same keep-latest window before the FULL OUTER
    // join, so the whole merge is windows + one user-keyed join —
    // never a row-level diff of the full fact table.
    "pipe_merge_upsert" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("us").desc, col("event_id").desc)
      def latest(pred: org.apache.spark.sql.Column) =
        Tables.events(s, d).where(pred)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("us"))
      val cut = lit("2024-03-01").cast("timestamp")
      val target = latest(col("ts") < cut)
      val source = latest(col("ts") >= cut)
      target.as("t")
        .join(source.as("s"), col("t.user_id") === col("s.user_id"), "full_outer")
        .where(col("s.event_type").isNull || col("s.event_type") =!= "error")
        .select(
          coalesce(col("t.user_id"), col("s.user_id")).as("user_id"),
          coalesce(col("s.event_type"), col("t.event_type")).as("state_type"),
          coalesce(col("s.us"), col("t.us")).as("state_us"),
          when(col("t.user_id").isNull, lit("insert"))
            .when(col("s.user_id").isNull, lit("carry"))
            .otherwise(lit("update")).as("action"))
    }),

    // Snapshot diff — deriving a change feed from two table versions
    // (the CDC bootstrap when the source can't emit one): full-outer
    // on the key, classify insert/delete/update/unchanged, report the
    // histogram. The two "versions" are deterministic slices of orders
    // (drop %7 keys from old, drop %5 from new, bump every %3 price)
    // so the oracle replays them exactly. Keys-plus-compared-columns
    // is all that moves — at scale you diff column hashes, not rows.
    "q_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val old = o.where(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("p_old"))
      val neu = o.where(pmod(col("o_orderkey"), lit(5)) =!= 0)
        .select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")).as("p_new"))
      old.join(neu, Seq("o_orderkey"), "full_outer")
        .select(when(col("p_old").isNull, "insert")
          .when(col("p_new").isNull, "delete")
          .when(col("p_old") =!= col("p_new"), "update")
          .otherwise("unchanged").as("change_type"))
        .groupBy("change_type").agg(count(lit(1)).as("cnt"))
    }),

    // EXCEPT: customers active in 1995 but not in 1996.
    "q_except_customers" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(year(col("o_orderdate")) === 1995).select("o_custkey")
        .except(o.where(year(col("o_orderdate")) === 1996).select("o_custkey"))
    }),

    // FULL OUTER join — the one join flavor the family was missing
    // (inner/left/semi/anti/cross/interval/as-of are all graded
    // elsewhere): per-customer 1995 vs 1996 order counts, keeping
    // customers active in EITHER year; absent sides surface as 0 via
    // coalesce (integer, never NULL, per the output-type policy).
    // Both sides pre-aggregate to one row per customer BEFORE the
    // join — the join moves customer-cardinality rows, not orders —
    // and the two aggregates and the join all hash on o_custkey, so
    // AQE coalesces into one logical partitioning.
    "q_full_outer_years" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def side(y: Int, as: String) =
        o.where(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as(as))
      side(1995, "n_1995").join(side(1996, "n_1996"), Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_1995"), lit(0L)).as("n_1995"),
          coalesce(col("n_1996"), lit(0L)).as("n_1996"))
    }),

    // INTERSECT: customers active in BOTH 1995 and 1996 (set semantics —
    // dedup rides the same hash exchange as the intersection itself).
    "q_intersect_customers" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(o.where(year(col("o_orderdate")) === 1996).select("o_custkey"))
    }),

    // CUBE: order counts over every subset of (year, status) — all four
    // grouping sets in ONE shuffle (the expansion happens map-side, each
    // row tagged with its grouping id before the exchange).
    "q_cube_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          // totalprice has cents: exact DECIMAL sum shipped as DOUBLE,
          // same policy as every money aggregate
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"))),

    // GROUPING SETS — the general form behind cube/rollup: an explicit
    // subtotal lattice (by status, by priority, by the pair, grand
    // total), one Expand + one aggregation shuffle like cube. The
    // grouping() markers disambiguate a NULL data value from a
    // subtotal row — without them the two hash identically and a
    // subtotal could silently absorb a data NULL.
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          |FROM v_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |  (o_orderstatus, o_orderpriority), ())""".stripMargin)
    }),

    // Left-semi: orders having at least one heavy lineitem.
    "q_semi_join" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).where(col("l_quantity") >= 45)
            .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))),

    // Left-anti: parts never ordered, per brand. The anti join only
    // needs the DISTINCT set of ordered part keys, which is bounded by
    // the part-key domain (|part| ≪ |lineitem|): pre-aggregate to
    // distinct keys (map-side partial dedup, 8-byte keys shuffle) and
    // broadcast, so the big table never shuffles for the join itself —
    // BroadcastHashJoin LeftAnti, plan-asserted. At a scale where the
    // key domain outgrows the driver, drop the hint and the same
    // pre-distinct still shrinks the shuffled build side.
    "q_anti_join" -> ((s, d) =>
      Tables.part(s, d)
        .join(
          broadcast(Tables.lineitem(s, d).select(col("l_partkey")).distinct()),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"))),

    // Typed Aggregator UDAF: geometric mean of part price per brand.
    // Grading follows the certificate pattern (same as HLL/CMS/SRP):
    // a log-sum merges in partition-dependent order, so its low bits —
    // and any fixed rounding of them — are not stable across runs or
    // engines (Math.log vs libm are each allowed 1 ulp). The row ships
    // the EXACT per-brand count and decimal price sum (hash-graded),
    // plus a within_bound certificate: the UDAF's geomean must sit
    // within 1e-9 relative of the same engine's built-in
    // exp(avg(ln)) — asserts the Aggregator's reduce/merge/finish
    // algebra, with a tolerance that absorbs summation-order noise.
    "q_geomean_price" -> ((s, d) =>
      Tables.part(s, d)
        .where(col("p_retailprice") > 0)
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").as("sum_price"),
          GeoMean.column(col("p_retailprice")).as("udaf_geo"),
          exp(avg(log(col("p_retailprice")))).as("ref_geo"))
        .select(col("p_brand"), col("n_parts"), col("sum_price"),
          when(abs(col("udaf_geo") - col("ref_geo")) <=
            lit(1e-9) * col("ref_geo"), 1L).otherwise(0L).as("within_bound"))))

  override def oracles: Map[String, String] = Map(
    "q_pivot_status" ->
      """SELECT year(o_orderdate) AS o_year,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY 1""".stripMargin,

    "q_full_outer_years" ->
      """WITH a AS (
        |  SELECT o_custkey, count(*) AS n_1995 FROM orders
        |  WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_1996 FROM orders
        |  WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
        |  CAST(coalesce(n_1995, 0) AS BIGINT) AS n_1995,
        |  CAST(coalesce(n_1996, 0) AS BIGINT) AS n_1996
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""".stripMargin,

    "q_except_customers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,

    "q_intersect_customers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,

    // HAVING count(*) > 0 pins the observed-rows lattice: Spark's
    // grouping sets emit NO rows on an empty table while ANSI/DuckDB
    // emit the () grand-total row (count 0) — the clause is a no-op on
    // any non-empty input (every lattice row aggregates >= 1 source
    // row) and aligns the one divergent case (r13 empty-corpus axis)
    "q_cube_orders" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (year(o_orderdate), o_orderstatus)
        |HAVING count(*) > 0""".stripMargin,

    // The oracle computes the long form directly, densified over the
    // full year × status grid so a status absent in some year still
    // yields the 0 row the wide table's coalesce produces.
    "q_unpivot_status" ->
      """WITH w AS (
        |  SELECT year(o_orderdate) AS o_year, o_orderstatus AS st, count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |y AS (SELECT DISTINCT o_year FROM w),
        |s AS (SELECT unnest(['F','O','P']) AS status)
        |SELECT y.o_year, status, CAST(coalesce(c, 0) AS BIGINT) AS cnt
        |FROM y CROSS JOIN s
        |LEFT JOIN w ON w.o_year IS NOT DISTINCT FROM y.o_year AND w.st = s.status""".stripMargin,

    // One-pass recompute: the merge above must equal this exactly.
    "pipe_incremental_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |FROM events GROUP BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice AS p_old FROM orders WHERE o_orderkey % 7 <> 0),
        |neu AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS p_new
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT CASE WHEN p_old IS NULL THEN 'insert'
        |            WHEN p_new IS NULL THEN 'delete'
        |            WHEN p_old <> p_new THEN 'update'
        |            ELSE 'unchanged' END AS change_type,
        |  count(*) AS cnt
        |FROM old FULL OUTER JOIN neu USING (o_orderkey)
        |GROUP BY 1""".stripMargin,

    "q_pit_state_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c0 AS (SELECT * FROM e WHERE prev IS NULL OR prev <> event_type),
        |ch AS (SELECT user_id, us AS cus, max_by(event_type, event_id) AS state
        |       FROM c0 GROUP BY 1, 2),
        |b AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT b.event_id, b.user_id, ch.state,
        |  CAST(b.us - ch.cus AS BIGINT) AS state_age_us
        |FROM b ASOF JOIN ch ON b.user_id = ch.user_id AND b.us >= ch.cus""".stripMargin,

    "pipe_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM e WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state, us AS valid_from,
        |  coalesce(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id), -1) AS valid_to
        |FROM c""".stripMargin,

    "pipe_merge_upsert" ->
      """WITH latest_t AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE ts < TIMESTAMP '2024-03-01') x WHERE rn = 1),
        |latest_s AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE ts >= TIMESTAMP '2024-03-01') x WHERE rn = 1)
        |SELECT coalesce(t.user_id, s.user_id) AS user_id,
        |  coalesce(s.event_type, t.event_type) AS state_type,
        |  coalesce(s.us, t.us) AS state_us,
        |  CASE WHEN t.user_id IS NULL THEN 'insert'
        |       WHEN s.user_id IS NULL THEN 'carry'
        |       ELSE 'update' END AS action
        |FROM latest_t t FULL OUTER JOIN latest_s s ON t.user_id = s.user_id
        |WHERE s.event_type IS NULL OR s.event_type <> 'error'""".stripMargin,

    "pipe_latest_snapshot" ->
      """SELECT user_id, event_id AS last_event, event_type AS last_type
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority), ())
        |HAVING count(*) > 0""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY 1""".stripMargin,

    // The oracle replays the exact columns and asserts the certificate:
    // the UDAF landed within its documented envelope of the reference.
    "q_geomean_price" ->
      """SELECT p_brand, count(*) AS n_parts,
        |  CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM part WHERE p_retailprice > 0 GROUP BY 1""".stripMargin)
}
