package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Event-stream operators beyond the reference's unwindowed running
  * totals: watermarked tumbling windows and custom gap-session state —
  * the two Structured Streaming primitives the reference's design
  * (global keyBy+sum, §2.7) never needed but a real event pipeline does.
  */
object EventStreams {

  /** Tumbling-window per-type counts with a watermark: late events
    * beyond `lateness` are dropped, window state is evicted once the
    * watermark passes — bounded state, unlike the reference's
    * grow-forever key space. Works on batch DataFrames too (watermark
    * is a no-op there), keeping the batch/stream duality. */
  def windowedTypeCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming exact dedup by key — the streaming twin of the batch
    * dedup family. With a watermark column present, state for a key is
    * dropped once the watermark passes (`withinWatermark`), so state
    * stays bounded; without one it falls back to global dedup
    * (grow-forever state, the reference's model). */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      watermarkCol: Option[String] = Some("ts"),
      lateness: String = "1 hour"): DataFrame =
    watermarkCol match {
      case Some(c) =>
        events.withWatermark(c, lateness).dropDuplicatesWithinWatermark(keys)
      case None => events.dropDuplicates(keys)
    }

  // user_id/value BOXED (the ValueEvent discipline, extended to the
  // session twin r15): the batch q_events_sessions groups null users
  // into ONE partition and sums values with SQL skip-null semantics —
  // a primitive decode killed the stream on the first null-user or
  // boundary-nulled-value event. `sum` rides the state as the decimal
  // string (scale-6 BigDecimal, the batch cast's exact accumulator);
  // null = no non-null value yet.
  case class Event(user_id: java.lang.Long, ts: Timestamp, value: java.lang.Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: String)
  case class Session(user_id: java.lang.Long, n_events: Long, duration_us: Long,
      sum_value: java.lang.Double)

  // user_id BOXED (the r13 ValueEvent discipline, extended r14): the
  // batch twins' PARTITION BY / groupBy put all null-user rows in ONE
  // group, so the streaming state key must too — a primitive decode
  // killed transitions/debounce/funnel on the first null user.
  case class TypedEvent(user_id: java.lang.Long, ts: Timestamp, event_type: String)
  case class FunnelState(stage: Int, stageTs: Long)
  case class FunnelAdvance(user_id: java.lang.Long, stage_idx: Long, stage: String, ts: Timestamp)

  /** Streaming conversion funnel: per-user stage machine over an
    * ordered `stages` chain, the streaming twin of `q_events_funnel`.
    * Emits one row each time a user ADVANCES a stage (strictly later
    * event time than the previous stage — presence alone never
    * advances, same rule as the batch query).
    *
    * State per user is two longs — stage index and its event time —
    * regardless of traffic volume, and is bounded two ways: completing
    * the chain resets the machine immediately (a later first-stage
    * event — same batch or later — starts a new conversion cycle, so
    * output never depends on micro-batch boundaries), and users stalled
    * mid-funnel longer than `idleTimeout` are evicted by a
    * processing-time timeout (pass None to disable — note that with a
    * timeout armed, the stream schedules batches continuously to fire
    * evictions, so `processAllAvailable`-style test drivers should
    * disable it). Within a micro-batch events are
    * sorted by event time; ACROSS batches the machine only moves
    * forward, so an out-of-order straggler that arrives after a later
    * stage was already taken is ignored (documented at-least-stage
    * semantics — buffering until the watermark would trade state size
    * for exact replay, which the batch query provides anyway). */
  def streamingFunnel(
      events: Dataset[TypedEvent],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      idleTimeout: Option[String] = Some("7 days")): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty)
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append, timeoutConf) {
        (user: java.lang.Long, rows: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // stalled mid-funnel past idleTimeout: most users never
            // convert, and without this the state store grows with
            // lifetime distinct users, not active ones
            state.remove()
            Iterator.empty
          } else if (user eq null) {
            // the batch q_events_funnel contract for the null-user
            // group: groupBy counts it at stage 0 (any view → one v
            // row), but every later stage rides an INNER join on
            // user_id, which a null key never matches — so the
            // anonymous bucket reaches stage 0 exactly once and never
            // advances (r15 injected-replay pass; treating null as an
            // ordinary key marched unrelated anonymous events through
            // the funnel as if they were one person)
            val out = Seq.newBuilder[FunnelAdvance]
            if (!state.exists) {
              rows.toSeq.filter(_.event_type == stages.head)
                .sortBy(e => micros(e.ts)).headOption.foreach { e =>
                  state.update(FunnelState(0, micros(e.ts)))
                  // NO idle timeout for the anonymous group: its state
                  // is a single bounded entry (eviction buys nothing),
                  // and evicting it would let a later anonymous view
                  // re-emit stage 0 — double-counting the null bucket
                  // vs the batch contract's exactly-once
                  out += FunnelAdvance(user, 0L, stages.head, e.ts)
                }
            }
            out.result().iterator
          } else {
            // micros, not getTime: the corpus carries sub-millisecond
            // timestamps and the batch join compares full-precision
            // ts — an ms-truncated strict-> would admit same-ms
            // later-us advances the batch rejects
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var st = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
            val out = Seq.newBuilder[FunnelAdvance]
            sorted.foreach { e =>
              val next = st.stage + 1
              if (next < stages.length && e.event_type == stages(next) &&
                  (st.stage < 0 || micros(e.ts) > st.stageTs)) {
                st = FunnelState(next, micros(e.ts))
                out += FunnelAdvance(user, next.toLong, stages(next), e.ts)
                // completion resets IN the loop, so a later first-stage
                // event in the SAME batch starts the next conversion
                // cycle exactly as it would from a later batch — output
                // must not depend on micro-batch boundaries
                if (next == stages.length - 1) st = FunnelState(-1, Long.MinValue)
              }
            }
            if (st.stage < 0) state.remove()
            else {
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  case class DebounceState(lastKeptUs: Long)

  case class TransState(lastType: String)
  case class Transition(user_id: java.lang.Long, from_type: String, to_type: String)

  /** Streaming twin of the batch `q_events_transitions` lag window:
    * per-user state is the LAST event's type — one string per key — so
    * each arriving event emits exactly one (from → to) pair against
    * its predecessor (none when the predecessor's type is null and a
    * null to_type emitted as-is, mirroring the batch form's
    * `from_type IS NOT NULL`-only filter). State
    * carries across micro-batches and is updated on EVERY non-empty
    * batch, including when the last event's type is null — skipping
    * the update there would resurrect the stale pre-batch type and
    * emit a pair the batch form never produces — so output never
    * depends on where batches split (EventStreamsSpec pins the
    * boundary case). Within a micro-batch events sort by
    * (event time, type nulls-first) — TypedEvent carries no event_id,
    * so same-instant ties break on the type rather than the batch
    * form's event_id (a documented divergence only visible on
    * same-timestamp pairs); the tie-break must not dereference the
    * type, since null event_type is declared-supported data and a
    * String.compareTo on it would kill the streaming query. A cross-batch straggler arriving BEHIND the carried state
    * chains after it rather than rewriting history (the batch window
    * form is the exact-order record — the same kept-vs-predecessor
    * asymmetry the debounce twins document). */
  def streamingTransitions(
      events: Dataset[TypedEvent],
      idleTimeout: Option[String] = Some("30 days")): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, timeoutConf) {
        (uid: java.lang.Long, rows: Iterator[TypedEvent], state: GroupState[TransState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e =>
              (micros(e.ts), if (e.event_type == null) 0 else 1, Option(e.event_type).getOrElse("")))
            var lastType = state.getOption.map(_.lastType).orNull
            val out = Seq.newBuilder[Transition]
            sorted.foreach { e =>
              // null to_type pairs ARE emitted — the batch form only
              // filters null from_type
              if (lastType != null) out += Transition(uid, lastType, e.event_type)
              lastType = e.event_type
            }
            if (sorted.nonEmpty) {
              state.update(TransState(lastType))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Event time at full microsecond resolution — `getTime` truncates
    * to ms; `getNanos` carries the sub-second part. The batch twin
    * measures gaps in `unix_micros`, so the streaming form must too.
    * private[graft] (r17): InjectedStreamReplaySpec's replay harness
    * must decode timestamps with the SAME kernel it audits, not a
    * byte-identical copy that can drift. */
  private[graft] def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming hourly-active-users — the stateful twin of the batch
    * `q_events_hau` report: EXACT per-hour distinct users via dedup
    * state keyed (user, hour) and bounded by the watermark, then a
    * watermarked tumbling count over the deduped stream. Two chained
    * stateful operators in append mode (supported since the
    * multi-stateful-operator work); state per live hour is one entry
    * per active user and is evicted once the watermark passes — the
    * exact-distinct answer while the hour is hot, where the unbounded
    * alternative (approx_count_distinct) would be the fallback only if
    * per-user state were too large. Works on batch frames too
    * (watermark and dedup state are no-ops there).
    *
    * `lateness` doubles as the dedup-state retention:
    * dropDuplicatesWithinWatermark only guarantees dedup of repeats
    * arriving within the watermark delay of the FIRST occurrence, so
    * matching the batch countDistinct needs delay ≥ bucket width +
    * allowed out-of-order lateness — a 30-minute delay let a user
    * repeat within one hour once the watermark passed the first
    * event's expiry, double-counting vs batch (the r16 injected
    * replay caught the same class on the monthly tier, at 4×). */
  def streamingHourlyActive(
      events: DataFrame,
      lateness: String = "90 minutes"): DataFrame =
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("user_id", "hour"))
      // count(user_id), NOT count(*): the batch twin's countDistinct
      // EXCLUDES null users, and a null user survives the dedup as one
      // row per hour — count(col) skips it while the hour group still
      // exists (an all-null hour answers hau=0, matching batch)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(col("user_id")).as("hau"))
      .select(col("window.start").as("hour"), col("hau"))

  // user_id/value are BOXED (nullable): the batch queries these
  // streams twin treat a null user as one window partition and a null
  // value as count-not-sum (the r13 null-user axis contract); a
  // primitive decode would kill the stream on the first such event.
  case class ValueEvent(user_id: java.lang.Long, ts: Timestamp, event_id: Long,
      value: java.lang.Double)
  case class EwmaState(recent: List[Double])
  case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

  /** (epoch-micros, RAW double value) entries still inside the
    * trailing window — bounded by window occupancy, never by a user's
    * lifetime traffic (the batch kernel's O(window) argument made
    * durable across micro-batches). The double is stored untouched and
    * converted decimal(18,6) at EMIT time: an unscaled-Long encoding
    * threw longValueExact past |v|≈9.2e12 and its running Long sum
    * could overflow on a dense window (r12 ADVICE) — raw doubles have
    * no exactness to lose and the emit-time BigDecimal chain is the
    * batch kernel's, bit-for-bit. */
  case class RollingState(entries: Seq[(Long, java.lang.Double)])
  case class RollingOut(user_id: java.lang.Long, event_id: Long, us: Long,
      n_1h: Long, sum_1h: java.lang.Double)

  /** Streaming EWMA — the stateful twin of batch `q_events_ewma`
    * (α = 1/2 truncated at `depth`, renormalized): state per user is
    * the last ≤ `depth` values (oldest first), carried across
    * micro-batches so the score stream is independent of batch
    * boundaries. Arithmetic mirrors the batch form exactly — each
    * value enters as BigDecimal at scale 6 HALF_UP (the decimal(18,6)
    * cast), the numerator is the exact decimal dot product against
    * 2^i weights, and ONE double division lands the score — so batch
    * and stream agree bit-for-bit (EventStreamsSpec pins it). Users
    * idle past `idleTimeout` are evicted; within a micro-batch events
    * sort by (event time, event_id) like the batch window. */
  def streamingEwma(
      events: Dataset[ValueEvent],
      depth: Int = 16,
      idleTimeout: Option[String] = Some("30 days")): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // The EWMA recurrence needs an identified user and a numeric
    // contribution — null-user / null-value events are dropped at the
    // door (stateful smoothing for an unidentified user is
    // meaningless, and a null contribution has no defined weight in
    // the truncated recurrence). This is a DOCUMENTED divergence from
    // the batch lag-window form, which emits rows whose null lag
    // contributions null out the score; EventStreamsSpec's parity
    // fixtures are non-null.
    events
      .filter(e => (e.user_id ne null) && (e.value ne null))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, timeoutConf) {
        (uid: java.lang.Long, rows: Iterator[ValueEvent], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var recent = state.getOption.map(_.recent).getOrElse(Nil)
            val out = Seq.newBuilder[EwmaOut]
            sorted.foreach { e =>
              recent = (recent :+ e.value.doubleValue).takeRight(depth)
              val m = recent.length
              // BigDecimal.decimal = valueOf(double) — the same
              // shortest-representation reading Spark's double →
              // decimal(18,6) cast applies before HALF_UP rounding
              val num = recent.zipWithIndex.map { case (v, i) =>
                BigDecimal.decimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
                  BigDecimal(BigInt(1) << i)
              }.sum
              out += EwmaOut(uid, e.event_id,
                num.toDouble / ((1L << m) - 1))
            }
            if (sorted.nonEmpty) {
              state.update(EwmaState(recent))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming trailing-window rolling count/sum per user — the stream
    * twin of the batch `q_events_rolling` deque kernel (r12: the
    * declarative RANGE frame measured O(n·w) per partition and was
    * replaced; THIS is the same two-pointer discipline on an unbounded
    * stream). State per user is only the events still inside the
    * trailing window as (micros, decimal-unscaled-long) pairs: exact
    * integer arithmetic, so incremental add/evict equals the batch
    * kernel's BigDecimal chain bit-for-bit (same shortest-repr
    * double→decimal(18,6) HALF_UP cast, same final toDouble). Equal
    * timestamps arriving in ONE micro-batch are peers exactly as in
    * batch; peers SPLIT across micro-batches diverge on the earlier
    * row only (it was already emitted — append mode cannot retract),
    * and a straggler strictly BEHIND the user's max seen time is
    * dropped (its frame pre-dates retained state — the
    * streamingDebounce discipline; EventStreamsSpec pins both edges).
    * Users idle past `idleTimeout` are evicted. */
  def streamingRolling(
      events: Dataset[ValueEvent],
      windowUs: Long = 3600000000L,
      idleTimeout: Option[String] = Some("30 days")): Dataset[RollingOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RollingState, RollingOut](
        OutputMode.Append, timeoutConf) {
        (uid: java.lang.Long, rows: Iterator[ValueEvent], state: GroupState[RollingState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var entries: Vector[(Long, java.lang.Double)] =
              state.getOption.map(_.entries.toVector).getOrElse(Vector.empty)
            var maxSeen = entries.lastOption.map(_._1).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[RollingOut]
            var i = 0
            while (i < sorted.length) {
              val us0 = micros(sorted(i).ts)
              if (us0 < maxSeen) {
                i += 1 // straggler behind retained state: dropped
              } else {
                var j = i
                while (j < sorted.length && micros(sorted(j).ts) == us0) j += 1
                entries = entries.dropWhile(_._1 < us0 - windowUs)
                (i until j).foreach { k =>
                  entries = entries :+ ((us0, sorted(k).value))
                }
                val cnt = entries.length.toLong
                // the batch kernel's exact chain, replayed over the live
                // window: shortest-repr double → decimal(18,6) HALF_UP
                // per entry, summed in BigDecimal (exact, associative —
                // so add/evict history cannot matter), one final
                // toDouble. Unbounded precision: nothing here throws or
                // overflows whatever the values or window occupancy.
                // Null values count toward n_1h but not the sum; sum is
                // NULL when the window holds no non-null value (the
                // batch kernel's count(*)/sum() contract).
                var anyNonNull = false
                val sumBD = entries.iterator
                  .foldLeft(java.math.BigDecimal.ZERO) { (acc, e) =>
                    if (e._2 eq null) acc
                    else {
                      anyNonNull = true
                      acc.add(java.math.BigDecimal.valueOf(e._2.doubleValue)
                        .setScale(6, java.math.RoundingMode.HALF_UP))
                    }
                  }
                val sumD: java.lang.Double =
                  if (!anyNonNull) null
                  else java.lang.Double.valueOf(sumBD.doubleValue)
                (i until j).foreach(k =>
                  out += RollingOut(uid, sorted(k).event_id, us0, cnt, sumD))
                maxSeen = us0
                i = j
              }
            }
            if (sorted.nonEmpty) {
              state.update(RollingState(entries))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming debounce — the TRUE stateful form the batch
    * `q_events_debounce` lag-filter approximates: an event is kept iff
    * it is the first for its (user, event_type) stream or at least
    * `minGapUs` after the last KEPT event (the lag form measures
    * against the immediate predecessor, kept or not, because that is
    * the one-window-pass vectorization; EventStreamsSpec pins the
    * fixture where the two disagree). State per key is ONE long — the
    * last kept event time — regardless of traffic, carried across
    * micro-batches so output never depends on batch boundaries; users
    * idle longer than `idleTimeout` are evicted (None disables, for
    * `processAllAvailable` test drivers). Out-of-order stragglers
    * BEHIND the last kept event are dropped (they arrived inside a
    * window that already suppressed them); within a micro-batch events
    * sort by event time. */
  def streamingDebounce(
      events: Dataset[TypedEvent],
      minGapUs: Long,
      idleTimeout: Option[String] = Some("30 days")): Dataset[TypedEvent] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceState, TypedEvent](
        OutputMode.Append, timeoutConf) {
        (_: (java.lang.Long, String), rows: Iterator[TypedEvent], state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var last = state.getOption.map(_.lastKeptUs).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[TypedEvent]
            sorted.foreach { e =>
              val us = micros(e.ts)
              if (last == Long.MinValue || us - last >= minGapUs) {
                last = us
                out += e
              }
            }
            if (last != Long.MinValue) {
              state.update(DebounceState(last))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join — the attribution join: every click
    * paired with the view(s) it follows within `horizon` for the same
    * user. In streaming BOTH sides must carry watermarks and the join
    * condition must bound event-time distance; together they let Spark
    * evict buffered rows once `watermark - horizon` passes, so join
    * state is bounded by traffic inside the horizon, not the stream's
    * lifetime. The same plan runs on batch DataFrames (watermark is a
    * no-op there): an equi-join on user_id with the interval as a
    * post-join filter — per-user row counts bound the work, no
    * cartesian blowup.
    *
    * `joinType = "inner"` drops un-attributed clicks immediately;
    * `"left_outer"` emits them with a null view — but only once the
    * watermark proves no matching view can still arrive, so outer rows
    * trail the inner ones by up to horizon + lateness (the standard
    * outer-join latency trade; EventStreamsSpec demonstrates it).
    */
  def clickAttribution(
      views: DataFrame,
      clicks: DataFrame,
      horizon: String = "1 hour",
      lateness: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", lateness)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    c.join(v, expr(
        s"user_id = v_user AND v_ts <= c_ts AND v_ts >= c_ts - INTERVAL $horizon"),
        joinType)
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("v_ts"), col("c_ts"))
  }

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState + processing-time timeout): a session
    * closes when `gapUs` passes without events; closed sessions are
    * emitted downstream. The streaming twin of the batch
    * `q_events_sessions` window query. */
  def streamingSessions(
      events: Dataset[Event],
      gapUs: Long = 6L * 3600 * 1000000): Dataset[Session] = {
    import events.sparkSession.implicits._
    // sum discipline = the rolling kernel's exact chain: per value
    // shortest-repr double → decimal(18,6) HALF_UP, added in BigDecimal
    // (exact, associative — micro-batch splits cannot matter), ONE
    // final toDouble at emit; null values count toward n_events but
    // not the sum, and an all-null session emits a NULL sum — the
    // batch count(*)/sum(cast decimal) contract. Event time is
    // micros(ts): the corpus carries sub-millisecond timestamps, and a
    // getTime-truncated gap check would close sessions the batch
    // unix_micros math keeps open (r15 replay-spec design pass).
    def addV(sum: String, v: java.lang.Double): String =
      if (v eq null) sum
      else {
        val d = java.math.BigDecimal.valueOf(v.doubleValue)
          .setScale(6, java.math.RoundingMode.HALF_UP)
        if (sum == null) d.toPlainString
        else new java.math.BigDecimal(sum).add(d).toPlainString
      }
    def emitSum(sum: String): java.lang.Double =
      if (sum == null) null
      else java.lang.Double.valueOf(new java.math.BigDecimal(sum).doubleValue)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: java.lang.Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => micros(e.ts))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (st == null) st = SessionState(us, us, 1, addV(null, e.value))
            else if (us - st.last > gapUs) {
              closed += Session(user, st.n, st.last - st.start, emitSum(st.sum))
              st = SessionState(us, us, 1, addV(null, e.value))
            } else st = SessionState(st.start, us, st.n + 1, addV(st.sum, e.value))
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  case class ShipEvent(order_id: Long, open_day: Long, ship_day: Long)
  case class OrderSpan(open: Long, close: Long)
  case class BacklogDelta(day: Long, d_opened: Long, d_closed: Long)

  /** Streaming sweep-line state — the incremental twin of batch
    * `q_orders_backlog`: per-order state is the interval (open day,
    * latest close day), 2 longs regardless of how many shipments the
    * order carries. The FIRST event for an order emits its open/close
    * delta pair; a later shipment that EXTENDS the close emits a
    * correction pair (cancel the old close delta, post the new one);
    * shipments inside the known span emit nothing. The downstream
    * per-day delta aggregation therefore converges to exactly the
    * batch deltas no matter how events split across micro-batches or
    * arrive out of order (EventStreamsSpec pins ≥3 splits), and the
    * day-axis cumulative backlog follows from the same bounded window
    * the batch query runs. Orders idle past `idleTimeout` are evicted
    * (None disables, for processAllAvailable test drivers). */
  def streamingBacklogDeltas(
      shipments: Dataset[ShipEvent],
      idleTimeout: Option[String] = Some("90 days")): Dataset[BacklogDelta] = {
    import shipments.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    shipments
      .groupByKey(_.order_id)
      .flatMapGroupsWithState[OrderSpan, BacklogDelta](
        OutputMode.Append, timeoutConf) {
        (_: Long, rows: Iterator[ShipEvent], state: GroupState[OrderSpan]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // DESCENDING ship-day order within the batch: the largest
            // close lands first, so every remaining shipment falls
            // inside the known span and the batch emits at most one
            // open pair plus one correction pair (ascending would
            // chain a correction pair per extension; same final sums,
            // maximal emissions)
            val sorted = rows.toSeq.sortBy(e => -e.ship_day)
            var st = state.getOption
            val out = Seq.newBuilder[BacklogDelta]
            sorted.foreach { e =>
              st match {
                case None =>
                  out += BacklogDelta(e.open_day, 1L, 0L)
                  out += BacklogDelta(e.ship_day + 1, 0L, 1L)
                  st = Some(OrderSpan(e.open_day, e.ship_day))
                case Some(s) if e.ship_day > s.close =>
                  out += BacklogDelta(s.close + 1, 0L, -1L)
                  out += BacklogDelta(e.ship_day + 1, 0L, 1L)
                  st = Some(s.copy(close = e.ship_day))
                case _ => ()
              }
            }
            st.foreach { s =>
              state.update(s)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Per-day distinct actives — the DAU half of the stickiness twin
    * (batch `q_events_stickiness`): watermarked (user, day) dedup
    * bounds state, then a 1-day tumbling window counts survivors in
    * append mode once the watermark closes the day. Same shape as
    * [[streamingHourlyActive]] on the day axis — and the same
    * retention rule: the dedup delay must cover bucket width plus
    * allowed lateness, hence two days. */
  def streamingDailyActive(
      events: DataFrame,
      lateness: String = "2 days"): DataFrame =
    events
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("user_id", "day"))
      // count(user_id) for the same null-exclusion reason as
      // [[streamingHourlyActive]] — batch dau is a countDistinct
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(col("user_id")).as("dau"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"), col("dau"))

  /** Per-month distinct actives — the MAU half of the stickiness twin:
    * (user, month) dedup, then an update-mode count keyed on the
    * month string (months aren't fixed-width, so no window() frame —
    * the sink's latest row per month is the census; month state is
    * bounded by the month axis).
    *
    * Default delay covers the WHOLE month plus lateness (35 days): a
    * 1-day delay evicted each (user, month) dedup entry a day after
    * its event, so every return visit re-counted — the r16 injected
    * replay measured MAU at 4× the batch census (the hand fixture
    * had masked the default by passing 60 days explicitly). Exact
    * monthly distincts cost month-long dedup state by nature; the
    * HLL tier is the fallback when that state is too large. */
  def streamingMonthlyActive(
      events: DataFrame,
      lateness: String = "35 days"): DataFrame =
    events
      .withColumn("month", date_format(date_trunc("month", col("ts")), "yyyy-MM"))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("user_id", "month"))
      // count(user_id): an all-null month keeps its row with mau=0
      // (the batch countDistinct shape) instead of counting the null
      // dedup survivor as an active user
      .groupBy("month")
      .agg(count(col("user_id")).as("mau"))

  // user_id BOXED (the TypedEvent discipline): the batch twin's as-of
  // join is INNER on user_id — a null key matches no change row, so
  // null-user purchases DROP; the stream mirrors by consuming the null
  // group silently (a primitive decode would kill the query instead).
  // `prev` carries the last EVENT's type, not the last change's state:
  // the batch change detector is a lag filter (`prev IS NULL OR
  // prev <> type`), and lag artifacts are part of the contract — a
  // null-type event is itself invisible as a change (prev <> NULL is
  // never true) but RESETS the chain so the NEXT event is always a
  // change, and two consecutive null types DO produce a null-state
  // change (prev IS NULL fires). Tracking only the change state
  // diverged from batch on exactly those sequences (r15 injected
  // replay pass).
  case class TypedIdEvent(user_id: java.lang.Long, event_id: Long, ts: Timestamp,
      event_type: String)
  case class PitState(state: String, cus: Long, prev: String)
  case class PitOut(event_id: Long, user_id: Long, state: String, state_age_us: Long)

  /** Streaming point-in-time enrichment — the stateful twin of batch
    * `q_pit_state_lookup`: per-user state is the CURRENT SCD-2 tuple
    * (state, change time — 2 fields however hot the
    * user), updated on every type change; a purchase emits the state
    * in force at its instant — the instant's FINAL state after the
    * whole change chain, including a change carried by the purchase
    * itself (the batch inclusive-as-of + per-instant-collapse
    * reading). Within a micro-batch events sort by (event time,
    * event_id); a
    * change arriving in a LATER batch but timestamped behind an
    * already-emitted purchase cannot retro-correct it — the standard
    * watermark discipline of streaming enrichment (EventStreamsSpec
    * pins equality with the batch query on event-time-ordered
    * splits). */
  def streamingPitLookup(
      events: Dataset[TypedIdEvent],
      idleTimeout: Option[String] = Some("90 days")): Dataset[PitOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PitState, PitOut](
        OutputMode.Append, timeoutConf) {
        (uid: java.lang.Long, rows: Iterator[TypedIdEvent], state: GroupState[PitState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (uid eq null) Iterator.empty // batch inner as-of: null users drop
          else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[PitOut]
            // two phases PER INSTANT, matching the batch reading: the
            // change chain advances through ALL of an instant's events
            // (id order) first, then the instant's purchases decorate
            // with the instant's FINAL state — the batch side collapses
            // same-instant change rows to the last one before the
            // inclusive as-of, which is exactly this. Change detection
            // replays the batch lag filter verbatim: prev (last EVENT
            // type) null → change; else a non-null differing type →
            // change; a null type is never itself `<>` prev.
            sorted.groupBy(e => micros(e.ts)).toSeq.sortBy(_._1)
              .foreach { case (us, evs) =>
                evs.foreach { e =>
                  val prev = if (st == null) null else st.prev
                  val isChange = prev == null ||
                    (e.event_type != null && e.event_type != prev)
                  st =
                    if (isChange) PitState(e.event_type, us, e.event_type)
                    else PitState(st.state, st.cus, e.event_type)
                }
                evs.foreach { e =>
                  if (e.event_type == "purchase")
                    out += PitOut(e.event_id, uid, st.state, us - st.cus)
                }
              }
            if (st != null) {
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Compose the two active tiers into the batch stickiness report —
    * shared presentation math (all-integer counts, ONE double
    * division) so the spec can assert the streamed result equals the
    * batch query bit-for-bit. `byDay` = (day, dau) finalized rows;
    * `byMonth` = (month, mau) latest-per-month rows. */
  def stickinessFrom(byDay: DataFrame, byMonth: DataFrame): DataFrame =
    byDay
      .select(substring(col("day"), 1, 7).as("month"), col("dau"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      .join(byMonth, Seq("month"))
      .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
        // mau = 0 (all-null month) → NULL, the batch query's pinned
        // contract — an unguarded 0/0 THROWS under ANSI mode
        when(col("mau") === 0, lit(null).cast("double"))
          .otherwise(col("sum_dau").cast("double") /
            (col("n_days") * col("mau"))).as("stickiness"))
}
