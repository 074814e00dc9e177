package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function / grouping-set surface beyond the reference's A11:
  * gap-based sessionization over the events stream table, exact
  * percentiles, and rollup subtotals.
  *
  * Scale notes: sessionization is the canonical "shuffle once by
  * entity, then window within partition" shape — one hash exchange on
  * user_id, both window functions and the session aggregate ride the
  * same partitioning (Catalyst collapses them into one sort+window
  * stage, no second shuffle). Percentile is a single-pass typed
  * aggregate; rollup is one shuffle with grouping-set expansion
  * map-side.
  */
object WindowQueries extends QueryPack {

  private val GapUs = 6L * 3600 * 1000000 // 6h session gap, microseconds
  private val DebounceUs = 24L * 3600 * 1000000 // 24h min-gap, microseconds

  override def queries: Map[String, Q] = Map(
    // Gap-based sessionization: lag -> new-session flag -> running sum
    // session id -> per-session rollup.
    "q_events_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_session",
          when(col("us") - lag("us", 1).over(byUser) > GapUs, 1).otherwise(0))
        .withColumn("session_id", sum("new_session").over(byUser))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max("us") - min("us")).as("duration_us"),
          // exact DECIMAL sum shipped as DOUBLE (DECIMAL outputs can't
          // hash-match the driver's float64 oracle reader)
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    }),

    // Event-time rolling aggregates: per user, each event carries its
    // trailing-1-hour event count and value sum. Same one-shuffle shape
    // as sessionization — hash on user_id, sort within the partition —
    // but the frame math is a streaming two-pointer kernel, NOT a
    // declarative RANGE frame: Spark's SlidingWindowFunctionFrame
    // re-aggregates the whole frame for every output row, O(n·w) per
    // partition, and w is unbounded for a dense user (r12 hot-user
    // probe: ONE bot user emitting 1 event/s made the trailing-hour
    // frame 3600 rows and took the query from 0.8 s to 201.6 s at
    // 800k hot events — a single serialized task no cluster
    // parallelizes around). The kernel walks each user's time-sorted
    // stream once, evicting expired rows from a deque and maintaining
    // the running sum incrementally — O(n) time, O(window) memory
    // (Spark's WindowExec buffers the whole PARTITION). Add/evict
    // stays bit-exact because the sum is DECIMAL(18,6): decimal
    // addition is associative, so incremental subtract equals frame
    // re-aggregation exactly, and the value cast reproduces Spark's
    // double→decimal path (shortest-repr BigDecimal, HALF_UP at scale
    // 6). Equal timestamps are peers (the RANGE semantic): rows
    // sharing (user, us) enter the frame together and emit identical
    // counts. The mapPartitions drop out of codegen is the documented
    // trade (the embedding-cosine kernel precedent) — bought only
    // after the declarative operator measured quadratic.
    "q_events_rolling" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .as[(java.lang.Long, Long, java.lang.Double, Long)]
        .mapPartitions { rows =>
          val in = rows.buffered
          new Iterator[(java.lang.Long, Long, Long, Long, java.lang.Double)] {
            private var pending: Iterator[(java.lang.Long, Long, Long, Long, java.lang.Double)] =
              Iterator.empty
            // user_id is NULLABLE: both engines' PARTITION BY treats
            // the null users as ONE partition, so the kernel must
            // process them as a group, not throw on decode (r13
            // null-user axis catch) — hence boxed key + null-safe
            // group comparison.
            private var curUser: java.lang.Long = null
            private var started = false
            // value is NULLABLE (a null dq entry): the RANGE frame this
            // kernel replaces counted a null-value row in count(*) but
            // skipped it in sum — and sum is NULL when the frame holds
            // no non-null value. A non-nullable decode threw on null
            // input instead (r12 ADVICE); nn tracks live non-nulls.
            private val dq =
              scala.collection.mutable.ArrayDeque.empty[(Long, java.math.BigDecimal)]
            private var sum = java.math.BigDecimal.ZERO
            private var nn = 0L
            def hasNext: Boolean = pending.hasNext || in.hasNext
            def next(): (java.lang.Long, Long, Long, Long, java.lang.Double) = {
              if (!pending.hasNext) {
                val (u, _, _, us0) = in.head
                if (!started || !java.util.Objects.equals(u, curUser)) {
                  curUser = u; started = true
                  dq.clear(); sum = java.math.BigDecimal.ZERO; nn = 0L
                }
                val group = scala.collection.mutable.ArrayBuffer
                  .empty[(java.lang.Long, Long, java.lang.Double, Long)]
                while (in.hasNext && java.util.Objects.equals(in.head._1, u) &&
                    in.head._4 == us0)
                  group += in.next()
                val lower = us0 - 3600000000L // trailing hour, microseconds
                while (dq.nonEmpty && dq.head._1 < lower) {
                  val ev = dq.removeHead()._2
                  if (ev ne null) { sum = sum.subtract(ev); nn -= 1 }
                }
                group.foreach { g =>
                  // Spark's Cast(double -> decimal(18,6)): shortest-repr
                  // BigDecimal of the double, then HALF_UP to scale 6
                  val vb =
                    if (g._3 eq null) null
                    else java.math.BigDecimal.valueOf(g._3.doubleValue)
                      .setScale(6, java.math.RoundingMode.HALF_UP)
                  dq.append((g._4, vb))
                  if (vb ne null) { sum = sum.add(vb); nn += 1 }
                }
                val n = dq.size.toLong
                val sd: java.lang.Double =
                  if (nn == 0) null else java.lang.Double.valueOf(sum.doubleValue)
                pending = group.iterator.map(g => (g._1, g._2, g._4, n, sd))
              }
              pending.next()
            }
          }
        }
        .toDF("user_id", "event_id", "us", "n_1h", "sum_1h")
    }),

    // Exponentially-weighted moving average per user (α = 1/2,
    // truncated at depth 16, renormalized over the weights actually
    // present) — the time-series smoother monitoring pipelines run.
    // Float EWMA recurrences drift across engines; here the numerator
    // is an EXACT decimal dot product of the last ≤16 values against
    // power-of-two weights 2^(m−1−j) (m = events so far, capped), the
    // denominator is the integer weight sum 2^m − 1, and the single
    // double division at the end is correctly rounded on both engines.
    // All 16 lag() calls share ONE window spec, so Catalyst schedules
    // a single sort+Window over the one user_id exchange — the same
    // one-shuffle shape as sessionization, linear at 100 TB.
    "q_events_ewma" -> ((s, d) => {
      val depth = 16
      val wo = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      var df = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("rn", row_number().over(wo))
      for (j <- 0 until depth)
        df = df.withColumn(s"v$j", lag(col("value"), j).over(wo))
      val num = (0 until depth).map { j =>
        when(col("rn") > j,
          (col(s"v$j").cast("decimal(18,6)") *
            expr(s"shiftleft(1L, least($depth, rn) - 1 - $j)")).cast("decimal(38,6)"))
          .otherwise(lit(0).cast("decimal(38,6)"))
      }.reduce(_ + _)
      df.select(col("user_id"), col("event_id"), col("us"),
        (num.cast("decimal(38,6)").cast("double") /
          (expr(s"shiftleft(1L, least($depth, rn))") - 1)).as("ewma"))
    }),

    // Hourly active users — tumbling-window DISTINCT (the DAU/HAU
    // report): countDistinct dedups inside the two-phase aggregate
    // (partial distinct per partition, merge at the hour key), never a
    // pre-distinct shuffle. Output is bounded by the hour axis.
    "q_events_hau" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"))
        .agg(countDistinct(col("user_id")).as("hau"),
          count(lit(1)).as("n_events"))),

    // HLL++ twin of the above — the 100 TB path for per-hour distincts
    // (r12 VERDICT #5: the exact form's distinct state was the events
    // family's worst per-2× rung). The sketch is MERGEABLE: partials
    // combine map-side and per-hour state is a constant-size register
    // set, never the hour's user set. Graded with the
    // q_approx_distinct_users certificate pattern: the raw estimate
    // can't hash cross-engine, so the row carries the exact count and
    // a within-bound flag (|approx−exact|/exact ≤ 3·rsd) the oracle
    // asserts TRUE — deterministic for a given dataset, and a broken
    // sketch flips it red.
    //
    // SHAPE (r13 ladder finding): the sketch and exact counts run as
    // SEPARATE aggregates over one persisted (hour, user) projection,
    // joined on the hour axis (720 rows — the stickiness pattern).
    // Mixing them in one agg plans the distinct-rewrite Expand, which
    // threads the rsd=0.01 HLL buffer (2^14 registers, ~16 KB) through
    // MILLIONS of intermediate (hour, user) groups instead of 720 hour
    // groups — 38 s at ×64 vs ~2 s for either aggregate alone, and the
    // per-group sketch memory defeats the operator's whole point.
    "q_events_hau_approx" -> ((s, d) => {
      val ev = graft.CacheRegistry.persistTracked(
        Tables.events(s, d)
          .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour"), col("user_id")))
      val exact = ev.groupBy("hour")
        .agg(countDistinct(col("user_id")).as("hau_exact"))
      val approx = ev.groupBy("hour")
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"))
      exact.join(approx, Seq("hour"))
        .select(col("hour"), col("hau_exact"),
          // hau_exact = 0 (an hour whose every user_id is NULL —
          // countDistinct skips nulls but the hour group still exists):
          // there is nothing to bound, so the certificate is vacuously
          // true — matching the oracle's constant-1 flag instead of the
          // unguarded 0/0 (the q_approx_percentiles n=0 convention;
          // nullify.py's all-null-hour arm grades this)
          when(col("hau_exact") === 0, 1L).otherwise(
            (abs(col("approx") - col("hau_exact")).cast("double") /
              col("hau_exact") <= 0.03).cast("long")).as("within_bound"))
    }),

    // DAU/MAU stickiness per month — the engagement-ratio KPI (what
    // share of a month's actives show up on an average day). Both
    // distinct tiers are two-phase countDistinct aggregates over ONE
    // persisted (month, day, user) projection; the month join is
    // month-cardinality. All-integer counts, ONE double division.
    "q_events_stickiness" -> ((s, d) => {
      val ev = graft.CacheRegistry.persistTracked(
        Tables.events(s, d)
          .select(date_format(date_trunc("month", col("ts")), "yyyy-MM").as("month"),
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id")))
      val byDay = ev.groupBy("month", "day")
        .agg(countDistinct(col("user_id")).as("dau"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val byMonth = ev.groupBy("month")
        .agg(countDistinct(col("user_id")).as("mau"))
      byDay.join(byMonth, Seq("month"))
        .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
          // mau = 0 (a month whose every user_id is NULL): the ratio is
          // 0/0 — pinned to NULL EXPLICITLY on both engines (the oracle
          // mirrors with CASE WHEN mau = 0 THEN NULL) rather than
          // trusting either engine's divide-by-zero convention
          when(col("mau") === 0, lit(null).cast("double"))
            .otherwise(col("sum_dau").cast("double") /
              (col("n_days") * col("mau"))).as("stickiness"))
    }),

    // New-vs-returning split per day: an event is "new" iff it is its
    // user's first event ever (row_number 1 over the user's event-time
    // order). One user_id exchange for the window, then a map-combining
    // day aggregate — the product-analytics acquisition report.
    "q_new_vs_returning" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("rn", row_number().over(w))
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_new_users"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_returning_events"))
    }),

    // Path analysis / sequence mining: each user's journey as the
    // ordered chain of their first 8 event types, then the top-10 most
    // common journeys — the product-analytics view q_events_transitions
    // (pairwise) cannot give. r12 rework: the original collected EVERY
    // event of a user into one aggregation buffer before slicing to 8
    // — "bounded per-user state" was false, and a 100M-event bot user
    // is a single-buffer OOM no partitioning fixes (the hot-user probe
    // that exposed q_events_rolling measured this path at 80 MB for a
    // 1.6M-event user — survivable there, unbounded by design). Now a
    // row_number ≤ 8 filter runs BEFORE the collect: it compiles to
    // WindowGroupLimit (the text_uncertainty_sample shape), which
    // streams the user-sorted partition keeping at most 8 rows per
    // user — state bounded by construction — and the groupBy(user_id)
    // rides the window's own hash partitioning, so the plan keeps its
    // two exchanges. The (us, event_id) window order is the same total
    // order the struct sort used (event_id unique), so the selected 8
    // and the emitted path are IDENTICAL; oracle untouched.
    "q_events_paths" -> ((s, d) => {
      val firstN = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("eid"))
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"),
          coalesce(col("event_type"), lit("")).as("t"))
        .withColumn("rn", row_number().over(firstN))
        .where(col("rn") <= 8)
        .select(col("user_id"),
          struct(col("us"), col("eid"), col("t")).as("e"))
        .groupBy("user_id")
        .agg(array_join(
          transform(array_sort(collect_list(col("e"))), x => x.getField("t")),
          ">").as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(10)
    }),

    // Conversion latency: per user, first view → first LATER buy; the
    // funnel-health metric (how long acquisition takes, not just
    // whether it completes). One map-combining conditional aggregate
    // to user cardinality, then exact integer-microsecond durations:
    // count, mean (one double division), and exact median via
    // percentile over the converted-user rows (entity cardinality —
    // the same bounded-rows argument as the RFM cutpoints).
    "q_time_to_convert" -> ((s, d) => {
      val perUser = graft.CacheRegistry.persistTracked(
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", unix_micros(col("ts")))).as("first_view"),
            min(when(col("event_type") === "buy", unix_micros(col("ts")))).as("first_buy"))
          .where(col("first_view").isNotNull && col("first_buy").isNotNull &&
            col("first_buy") > col("first_view"))
          .select((col("first_buy") - col("first_view")).as("lat_us")))
      // latencies are near-unique per user, so percentile()'s
      // value→count buffer would hold ~every converted user on one
      // task; the median comes from the bounded selection kernel
      // instead (exact same interpolation arithmetic — r9)
      val n = perUser.count()
      val p50 =
        if (n == 0) lit(null).cast("double")
        else round(lit(graft.queries.StatsQueries
          .exactQuantileDouble(perUser, "lat_us", 0.5, n)), 6)
      perUser.agg(
        count(lit(1)).as("n_converted"),
        (sum(col("lat_us")).cast("double") / count(lit(1))).as("mean_us"),
        p50.as("p50_us"))
    }),

    // Attribution interval join: every click paired with the view(s) it
    // follows within an hour, same user. The SHARED kernel with the
    // streaming path (EventStreams.clickAttribution — watermarked
    // stream-stream join with bounded state); in batch the same plan is
    // an equi-join on user_id with the interval as a post-join filter.
    "q_events_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.EventStreams.clickAttribution(
          views = ev.where(col("event_type") === "view"),
          clicks = ev.where(col("event_type") === "click"),
          horizon = "1 hour")
        .select("click_id", "user_id", "view_id")
    }),

    // Day-over-day growth: per-type daily counts with lag() percent
    // change — the dashboard-analytics window shape. Partitioned by
    // type, so the window never funnels to one task; first day of each
    // type keeps a NULL growth on both engines.
    // Telemetry debounce / min-gap thinning: an event that fires within
    // the threshold of its predecessor in the same (user, event_type)
    // stream is dropped — the standard vectorized repeat-event filter
    // (the stateful variant relative to the previously KEPT event is
    // the streaming form; batch pipelines use the lag form because it
    // is one window pass). Threshold sized to this corpus's per-stream
    // arrival rate (~3.5-day mean gap) so the filter discriminates.
    // Shape: ONE user/type exchange — the window and the aggregate ride
    // the same hash partitioning (subset rule), plan-asserted.
    "q_events_debounce" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .withColumn("kept",
          when(col("gap").isNull || col("gap") >= DebounceUs, 1L).otherwise(0L))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_events"), sum("kept").as("n_kept"))
    }),

    // ntile bucketing — the remaining ranking window function (rank /
    // row_number / percentile are graded elsewhere). Deliberately the
    // PARTITIONED form (quartiles of each user's event values): a
    // global ntile funnels every row through one partition, which is
    // exactly the shape the 100 TB bar forbids — per-entity ntile
    // rides the usual one-exchange window + same-keyed aggregate
    // (ClusteredDistribution on (user, quartile) is satisfied by the
    // user_id hash partitioning). Ties broken by event_id so bucket
    // assignment is deterministic on both engines.
    "q_events_value_ntile" -> ((s, d) => {
      // null ordering PINNED on both sides (r13 null axis): Spark
      // ascending defaults NULLS FIRST, DuckDB NULLS LAST — a null
      // value silently rotates every quartile assignment for its user
      // unless both engines state the same placement
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").asc_nulls_first, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("user_id", "quartile")
        .agg(count(lit(1)).as("n_events"),
          min("value").as("min_value"), max("value").as("max_value"))
    }),

    // Robust daily-volume anomaly flags — median/MAD, the
    // outlier-resistant complement to q_events_outliers' moment-based
    // 3-sigma (one broken day inflates a sigma and masks itself; it
    // cannot move a median). Day counts reduce map-side to
    // (type × day) cardinality first, so both exact medians
    // (percentile interpolates integer counts to exact binary halves /
    // quarters — the RFM-cutpoint argument, so the 3·MAD comparison is
    // bit-identical cross-engine) run over bounded per-type series,
    // and the two one-row-per-type tables broadcast back. The fact
    // table is scanned once; nothing row-level ever shuffles.
    "q_events_anomaly" -> ((s, d) => {
      val daily = graft.CacheRegistry.persistTracked(
        Tables.events(s, d)
          .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt")))
      // daily counts / deviations are bounded-distinct domains per
      // type (the percentile buffer is the day axis; r9 audit)
      val med = daily.groupBy("event_type")
        .agg(percentile(col("cnt"), lit(0.5)).as("med"))
      val dev = daily.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("cnt") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("dev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .where(col("dev") > lit(3.0) * col("mad"))
        .select(col("event_type"), col("day"), col("cnt"), col("med"), col("mad"))
    }),

    "q_events_growth" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
      Tables.events(s, d)
        // date_trunc (timestamp), not to_date: the driver reads Spark
        // dates as date objects but DuckDB dates as datetimes — a DATE
        // output column can never hash-match (same asymmetry as DECIMAL)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        .withColumn("prev", lag("cnt", 1).over(w))
        .select(col("event_type"), col("day"), col("cnt"),
          round((col("cnt") - col("prev")).cast("double") / col("prev"), 6)
            .as("growth"))
    }),

    // Gap-filled hourly series: per-type hourly counts with missing
    // hours present as zeros — the generated-dimension pattern (a
    // time-series consumer needs a dense axis). The hour axis is
    // sequence()-generated from the observed span (1 row -> ~720) and
    // cross-joined with the 5 types: both broadcast; only the count
    // aggregation touches the fact table.
    "q_events_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      val counts = ev.groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      val hours = ev.agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("hr"))
      val types = ev.select("event_type").distinct()
      broadcast(types).crossJoin(broadcast(hours))
        .join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
    }),

    // Cohort retention curve: users grouped by first-activity day, how
    // many are still active N days later. ONE shuffle on user_id — the
    // per-user day set rides a collect_set (bounded: the table spans 30
    // days, and map-side combine dedups before the exchange), the cohort
    // day is just array_min of it, and the final day_offset histogram is
    // a ~30-key aggregate.
    // user_id IS NOT NULL on BOTH engines: a cohort is a USER — and
    // without the filter the engines silently disagree (Spark's
    // groupBy keeps a null-user group, the oracle's JOIN USING drops
    // it; r13 null-user axis catch).
    "q_events_retention" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("user_id").agg(collect_set("day").as("days"))
        .select(explode(col("days")).as("day"), array_min(col("days")).as("d0"))
        .select(datediff(col("day"), col("d0")).cast("long").as("day_offset"))
        .groupBy("day_offset").agg(count(lit(1)).as("n_users"))
        .orderBy("day_offset")),

    // Sliding (overlapping) windows in batch: 1-hour windows every 15
    // minutes, so each event lands in exactly 4 windows. Spark expands
    // the windows map-side before ONE aggregation shuffle; windows
    // align to the epoch (session TZ pinned UTC), which the oracle
    // replays as floor-to-15min minus j·15min for j in 0..3.
    "q_events_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("cnt"))),

    // Grouped exact quartiles: linear-interpolation percentile per
    // return flag, one pass, no window (percentile is an aggregate).
    // Scale note (r9 percentile audit): the per-group buffer holds one
    // entry per DISTINCT value — l_quantity is a 50-value domain, so
    // the buffer is O(50) however many rows a flag carries. Exact
    // percentile is the right tool HERE; near-unique domains route
    // through StatsQueries.exactQuantileDouble instead (RFM monetary,
    // conversion latency).
    // Quantities are integer-valued and the 0.25 grid is binary-exact,
    // so the interpolated values are bit-identical across engines;
    // round(6) guards the general case. Output policy: scalar columns
    // only (q1/q2/q3, never an ARRAY) — the driver's canonicalizer
    // cannot sort/hash nested types (same class as the DECIMAL/DATE
    // rules; r3's one red row was the ARRAY form of this query).
    "q_quartiles_by_flag" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.25)), 6).as("q1"),
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("q2"),
          round(percentile(col("l_quantity"), lit(0.75)), 6).as("q3"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Exact percentiles of per-document token counts — token counts
    // are a bounded-distinct domain (the percentile buffer is the
    // domain, not the documents; r9 percentile audit).
    "q_token_percentiles" -> ((s, d) =>
      Tables.documents(s, d)
        .select(size(split(trim(col("text")), graft.functions.UnicodeText.WsPlus)).as("n_tokens"))
        .agg(
          round(percentile(col("n_tokens"), lit(0.5)), 6).as("p50"),
          round(percentile(col("n_tokens"), lit(0.9)), 6).as("p90"),
          round(percentile(col("n_tokens"), lit(0.99)), 6).as("p99"),
          max("n_tokens").as("p100"))),

    // Approximate percentiles — the 100 TB quantile path (Spark's
    // Greenwald-Khanna sketch: single pass, mergeable, bounded memory,
    // no sort). Exact `percentile` materializes every value per group;
    // at corpus scale the sketch is the only affordable option, and its
    // contract is a RANK guarantee: accuracy=100 returns an element
    // whose rank is within ±1% of target. Graded like the HLL/CMS tier:
    // the certificate asserts the sketch value lies inside the exact
    // ±2%-rank envelope (computed in the same pass), and the oracle
    // asserts TRUE — the sketch is deterministic per dataset, so a
    // broken sketch flips the row red.
    "q_approx_percentiles" -> ((s, d) =>
      Tables.documents(s, d)
        .select(size(split(trim(col("text")), graft.functions.UnicodeText.WsPlus)).as("n_tokens"))
        .agg(
          percentile_approx(col("n_tokens"), lit(0.5), lit(100)).as("a50"),
          percentile_approx(col("n_tokens"), lit(0.9), lit(100)).as("a90"),
          percentile(col("n_tokens"), lit(0.48)).as("lo50"),
          percentile(col("n_tokens"), lit(0.52)).as("hi50"),
          percentile(col("n_tokens"), lit(0.88)).as("lo90"),
          percentile(col("n_tokens"), lit(0.92)).as("hi90"),
          count(lit(1)).as("n"))
        .select(col("n"),
          // n = 0: there is nothing to bound — the certificate is
          // vacuously true (the oracle's constant-1 flags; r13 empty
          // axis caught the NULL comparisons reading as unbounded)
          when(col("n") === 0, 1L).otherwise(
            (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
              .cast("long")).as("p50_within_bound"),
          when(col("n") === 0, 1L).otherwise(
            (col("a90") >= col("lo90") && col("a90") <= col("hi90"))
              .cast("long")).as("p90_within_bound"))),

    // Rollup: revenue per (region, year) with region and grand totals.
    "q_rollup_revenue" -> ((s, d) => {
      // Same §2.3 pre-aggregation as q_region_revenue (r17): the
      // rollup keys are all orders-side, so lineitem collapses to
      // exact per-order (decimal sum, item count) partials before the
      // okey join — identical output (decimal sums exact/associative,
      // counts distribute; the empty-input case is pinned on both
      // engines already: Spark grouping sets emit no rows, the oracle
      // carries HAVING count(*) > 0).
      val li = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("orev"),
          count(lit(1)).as("oitems"))
      val ord = Tables.orders(s, d)
      val cust = broadcast(Tables.customer(s, d))
      val nat = broadcast(Tables.nation(s, d))
      val reg = broadcast(Tables.region(s, d))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("orev")).cast("double").as("revenue"),
          sum(col("oitems")).as("n_items"))
    }))

  override def oracles: Map[String, String] = Map(
    "q_events_sessions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              > $GapUs THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |s AS (
         |  SELECT user_id, event_id, value, us,
         |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM e)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  max(us) - min(us) AS duration_us,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM s GROUP BY 1, 2""".stripMargin,

    "q_events_rolling" ->
      """SELECT user_id, event_id, epoch_us(ts) AS us,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_events_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(
        |      list(coalesce(event_type, '') ORDER BY epoch_us(ts), event_id)[1:8],
        |      '>') AS path
        |  FROM events GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p
        |GROUP BY 1 ORDER BY n_users DESC, path LIMIT 10""".stripMargin,

    "q_time_to_convert" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
        |    min(CASE WHEN event_type = 'buy' THEN epoch_us(ts) END) AS fb
        |  FROM events GROUP BY 1),
        |lat AS (
        |  SELECT fb - fv AS lat_us FROM u
        |  WHERE fv IS NOT NULL AND fb IS NOT NULL AND fb > fv)
        |SELECT count(*) AS n_converted,
        |  CAST(sum(lat_us) AS DOUBLE) / count(*) AS mean_us,
        |  round(quantile_cont(lat_us, 0.5), 6) AS p50_us
        |FROM lat""".stripMargin,

    "q_events_hau" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(DISTINCT user_id) AS hau, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // The oracle asserts the certificate: exact per-hour distinct
    // matches AND the HLL estimate landed inside its 3·rsd envelope.
    "q_events_hau_approx" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(DISTINCT user_id) AS hau_exact, CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY 1""".stripMargin,

    "q_events_stickiness" ->
      """WITH ev AS (
        |  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
        |         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id
        |  FROM events),
        |dau AS (
        |  SELECT month, day, count(DISTINCT user_id) AS dau
        |  FROM ev GROUP BY 1, 2),
        |md AS (
        |  SELECT month, count(*) AS n_days, CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM dau GROUP BY 1),
        |mau AS (SELECT month, count(DISTINCT user_id) AS mau FROM ev GROUP BY 1)
        |SELECT month, n_days, sum_dau, mau,
        |  CASE WHEN mau = 0 THEN NULL
        |       ELSE CAST(sum_dau AS DOUBLE) / (n_days * mau) END AS stickiness
        |FROM md JOIN mau USING (month)""".stripMargin,

    "q_new_vs_returning" ->
      """WITH e AS (
        |  SELECT ts, row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new_users,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_returning_events
        |FROM e GROUP BY 1""".stripMargin,

    "q_events_ewma" -> {
      val depth = 16
      val lags = (0 until depth)
        .map(j => s"lag(value, $j) OVER w AS v$j").mkString(",\n         |    ")
      val terms = (0 until depth).map(j =>
        s"""CASE WHEN rn > $j THEN CAST(CAST(v$j AS DECIMAL(18,6)) *
           |      ((1::BIGINT << (least($depth, rn) - 1 - $j))) AS DECIMAL(38,6))
           |    ELSE CAST(0 AS DECIMAL(38,6)) END""".stripMargin).mkString(" +\n  ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         |    row_number() OVER w AS rn,
         |    $lags
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
         |SELECT user_id, event_id, us,
         |  CAST(($terms) AS DOUBLE)
         |    / ((1::BIGINT << least($depth, rn)) - 1) AS ewma
         |FROM e""".stripMargin
    },

    "q_events_debounce" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |    us - lag(us) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
         |  FROM events)
         |SELECT user_id, event_type, count(*) AS n_events,
         |  CAST(sum(CASE WHEN gap IS NULL OR gap >= $DebounceUs THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM e GROUP BY 1, 2""".stripMargin,

    "q_events_value_ntile" ->
      """WITH t AS (
        |  SELECT user_id, event_id, value,
        |    ntile(4) OVER (PARTITION BY user_id ORDER BY value NULLS FIRST, event_id) AS quartile
        |  FROM events)
        |SELECT user_id, CAST(quartile AS INTEGER) AS quartile, count(*) AS n_events,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM t GROUP BY 1, 2""".stripMargin,

    "q_events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, quantile_cont(cnt, 0.5) AS med
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT daily.event_type AS event_type, day, cnt, med,
        |         abs(cnt - med) AS dev
        |  FROM daily JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type AS event_type, day, cnt, med, mad
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev > 3 * mad""".stripMargin,

    "q_events_growth" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, cnt,
        |  round((cnt - prev) * 1.0 / prev, 6) AS growth
        |FROM (SELECT event_type, day, cnt,
        |        lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |      FROM c)""".stripMargin,

    "q_events_gapfill" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS hr FROM events),
        |span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM span),
        |types AS (SELECT DISTINCT event_type FROM e),
        |c AS (SELECT event_type, hr, count(*) AS cnt FROM e GROUP BY 1, 2)
        |SELECT t.event_type, h.hr, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM types t CROSS JOIN hours h
        |LEFT JOIN c ON c.event_type = t.event_type AND c.hr = h.hr""".stripMargin,

    "q_events_attribution" ->
      """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
        |FROM events c
        |JOIN events v ON c.user_id = v.user_id
        |  AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR
        |WHERE c.event_type = 'click' AND v.event_type = 'view'""".stripMargin,

    "q_events_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1)
        |SELECT CAST(date_diff('day', d0, day) AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_sliding" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 900000000) * 900000000 AS f15
        |  FROM events),
        |w AS (
        |  SELECT event_type, f15 - j * 900000000 AS ws
        |  FROM e CROSS JOIN range(0, 4) t(j))
        |SELECT make_timestamp(ws) AS window_start, event_type,
        |  count(*) AS cnt
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_quartiles_by_flag" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q1,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS q2,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS q3,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the GK sketch's rank contract asserted as a certificate
    "q_approx_percentiles" ->
      """SELECT count(*) AS n, CAST(1 AS BIGINT) AS p50_within_bound,
        |  CAST(1 AS BIGINT) AS p90_within_bound
        |FROM documents""".stripMargin,

    "q_token_percentiles" ->
      """SELECT
        |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
        |  round(quantile_cont(n_tokens, 0.9), 6) AS p90,
        |  round(quantile_cont(n_tokens, 0.99), 6) AS p99,
        |  max(n_tokens) AS p100
        |FROM (SELECT len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |      FROM documents)""".stripMargin,

    "q_rollup_revenue" ->
      """SELECT r_name, o_year, CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n_items
        |FROM (
        |  SELECT r_name, year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS price
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |GROUP BY ROLLUP (r_name, o_year)
        |HAVING count(*) > 0""".stripMargin)
}
