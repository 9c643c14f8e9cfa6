package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations (SURVEY.md §2.9 extension surface —
  * the reference has only file-arrival batching; these are the stock
  * Structured Streaming operators a general engine owes its users):
  * watermarked tumbling windows, session windows, and arbitrary keyed state
  * via flatMapGroupsWithState.
  *
  * Every transform here takes a DataFrame with an event-time `ts` TIMESTAMP
  * column (the `events` fixture after Tables.events conversion) and works
  * identically over `read` (batch backfill) and `readStream` (live) inputs
  * — the same code path serves both, which is the Spark-native replacement
  * for maintaining separate batch/streaming pipelines.
  */
object StreamingAggregates {

  /** Watermarked tumbling-window counts/sums per event type. The 1-hour
    * watermark bounds state: at 100 TB/day ingest the state store holds
    * only open windows, and late events beyond the watermark are dropped
    * deterministically.
    */
  def hourlyTypeAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming HyperLogLog register maintenance — live distinct-count
    * sketches per group ([[graft.ops.Sketches.hllSketch]] applied to a
    * stream): register = MAX(rho) is associative, commutative and
    * idempotent, so micro-batch order, replays and retries cannot
    * change the registers — complete-mode output at any trigger equals
    * the batch sketch over the rows seen so far BIT-FOR-BIT (asserted
    * in StreamingAggSpec), and [[graft.ops.Sketches.hllEstimate]]
    * reads estimates off the live registers. State is bounded at
    * groups × 2^p registers regardless of stream length — no
    * watermark needed (unlike COUNT DISTINCT, whose state grows with
    * cardinality).
    */
  def streamingHllRegisters(events: DataFrame, groupCols: Seq[String],
                            valueCol: String, p: Int = 9): DataFrame =
    graft.ops.Sketches.hllSketch(events, groupCols, valueCol, p)

  /** Event-time session windows (30 min gap) per user. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Stream-stream event-time interval join: pair each left event with the
    * same user's right events that happen within `withinMinutes` AFTER it.
    * Both sides carry watermarks and the join condition bounds event time in
    * BOTH directions — exactly what Structured Streaming needs to compute a
    * state-eviction horizon for each side (without the range bound, both
    * join states grow forever). State per side ≈ watermark-window of rows,
    * independent of total stream length — the 100 TB-per-day safe shape.
    *
    * Same code path runs over batch DataFrames (batch backfill ==
    * streaming, asserted in StreamingAggSpec).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   withinMinutes: Int = 30): DataFrame = {
    val l = left.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", "1 hour")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** Streaming daily active users — exact distinct users per event-time
    * day, maintained incrementally: a watermarked streaming dedup on
    * (user, day) keeps ONE state row per active user-day — and because
    * the dedup key set includes the event-time column itself, the state
    * store evicts a day's rows as soon as the watermark passes it — then
    * a watermarked per-day count. No COUNT DISTINCT ever runs; the
    * distinctness is the dedup state, which is the scalable shape
    * (state ∝ active user-days inside the watermark horizon, not stream
    * length).
    *
    * Update mode emits a day's running count each micro-batch it grows;
    * the final value per day equals the batch
    * [[graft.ops.EventOps.rollingDistinctUsers]] (L=1) on the same
    * events — asserted in StreamingAggSpec. The identical code path
    * runs over a batch frame (withWatermark is a no-op there).
    *
    * → (day DATE, dau BIGINT)
    */
  def dailyActiveUsers(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
      .withWatermark("day_ts", "2 days")
      .dropDuplicates("user_id", "day_ts")
      .groupBy(col("day_ts"))
      .agg(count(lit(1)).as("dau"))
      .select(to_date(col("day_ts")).as("day"), col("dau"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary keyed state: running per-user totals maintained across
    * micro-batches with flatMapGroupsWithState (update mode). State is one
    * small record per user — the scalable shape for per-entity counters.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunning(userId, n, total)
          state.update(next)
          Iterator(next)
        })
  }

  final case class StepEvent(user_id: Long, step_idx: Int, us: Long)
  final case class FunnelBuf(step_idxs: Array[Int], uss: Array[Long], n_seen: Long)
  final case class FunnelTimes(user_id: Long, n_seen: Long, times: Array[Long])

  /** Incremental ordered funnel — the streaming flavor of
    * [[graft.ops.EventOps.funnel]] (strict-order, bounded-window,
    * first-occurrence chain), maintained per user across micro-batches
    * with flatMapGroupsWithState in update mode.
    *
    * Correctness contract: after ANY arrival order of the same events,
    * the latest emitted row per user equals the batch funnel over those
    * events. The state holds the user's step-relevant events (step
    * index + epoch-micros — never the payload), and each update replays
    * the batch recurrence over the time-sorted buffer: a late-arriving
    * EARLIER signup lowers t1 and legitimately re-derives every later
    * step, which no fill-in-place scheme gets right. Buffer-and-replay
    * is exact; per-user cost is the user's own step-event count (the
    * funnel projection drops every non-step event before the shuffle,
    * so state is per-user TRAJECTORY size, not stream size).
    *
    * Emission: one row per touched user per micro-batch — (user_id,
    * n_seen, t1..tk), t_i NULL while unfilled. `n_seen` increases
    * monotonically, so "latest state" = max n_seen per user. Users whose
    * buffered events never include steps(0) carry all-NULL times (the
    * batch funnel has no row for them — filter `t1 IS NOT NULL` for the
    * batch-equivalent frame).
    */
  def streamingFunnel(spark: SparkSession, events: DataFrame,
                      steps: Seq[String], windowUs: Long): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty, "streamingFunnel needs at least one step")
    require(windowUs > 0, "windowUs must be positive")
    val k = steps.size
    val idx = typedLit(steps.zipWithIndex.toMap)
    val ev = events
      .select(col("user_id").cast("long").as("user_id"),
        idx(col("event_type")).as("step_idx"),
        unix_micros(col("ts")).as("us"))
      .filter(col("step_idx").isNotNull)
      .as[StepEvent]
    val updates = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[StepEvent],
         state: GroupState[FunnelBuf]) => {
          val prev = state.getOption.getOrElse(
            FunnelBuf(Array.empty, Array.empty, 0L))
          val fresh = batch.toArray
          val stepIdxs = prev.step_idxs ++ fresh.map(_.step_idx)
          val uss = prev.uss ++ fresh.map(_.us)
          state.update(FunnelBuf(stepIdxs, uss, prev.n_seen + fresh.length))
          // replay the batch recurrence over the time-sorted buffer:
          // t1 = first steps(0); t_{i+1} = first steps(i) strictly after
          // t_i and within windowUs of t1. Ties sort step-first so a
          // same-instant later step never counts (us > t_i is strict).
          val order = stepIdxs.indices.sortBy(i => (uss(i), stepIdxs(i)))
          val t = Array.fill(k)(Long.MinValue)
          var filled = 0
          order.foreach { i =>
            if (filled < k && stepIdxs(i) == filled &&
                (filled == 0 ||
                  (uss(i) > t(filled - 1) && uss(i) <= t(0) + windowUs))) {
              t(filled) = uss(i)
              filled += 1
            }
          }
          Iterator(FunnelTimes(userId, prev.n_seen + fresh.length, t))
        })
    updates.toDF().select(
      col("user_id") +: col("n_seen") +:
        steps.indices.map { i =>
          val e = element_at(col("times"), i + 1)
          when(e =!= Long.MinValue, e).as(s"t${i + 1}")
        }: _*)
  }

  final case class GapEvent(user_id: Long, us: Long, tie: Long)
  final case class GapBuf(uss: Array[Long], ties: Array[Long])
  final case class CadenceRow(user_id: Long, n_gaps: Long,
                              mean_gap_us: Double, cv: Option[Double],
                              is_regular: Option[Boolean])

  /** Incremental inter-event cadence — the streaming flavor of
    * [[graft.ops.EventOps.cadenceProfile]] (the bot/automation gate),
    * maintained per user across micro-batches with
    * flatMapGroupsWithState in update mode.
    *
    * The [[streamingFunnel]] buffer-and-replay contract: state holds
    * the user's (us, tie) pairs — late or out-of-order arrivals
    * re-sort and re-derive every gap, which no incremental running-
    * moment scheme gets right when an EARLIER event arrives late and
    * splits an existing gap in two. Moments replay exactly: Σg in
    * Long, Σg² in BigInt (the batch side's DECIMAL(38,0)), both
    * converging to the same nearest-double as the batch VARCHAR
    * bridge, then the identical IEEE mean/variance/cv sequence — so
    * the LATEST emission per user equals the batch profile
    * bit-for-bit (asserted in StreamingAggSpec).
    *
    * State is per-user trajectory-sized (two longs per event), the
    * [[streamingFunnel]] budget.
    */
  def streamingCadence(spark: SparkSession, events: DataFrame,
                       cvFlag: Double = 0.1): DataFrame = {
    import spark.implicits._
    val ev = events.select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("tie"))
      .as[GapEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[GapEvent],
         state: GroupState[GapBuf]) => {
          val prev = state.getOption.getOrElse(
            GapBuf(Array.empty, Array.empty))
          val fresh = batch.toArray
          val uss = prev.uss ++ fresh.map(_.us)
          val ties = prev.ties ++ fresh.map(_.tie)
          state.update(GapBuf(uss, ties))
          if (uss.length < 2) Iterator.empty
          else {
            val order = uss.indices.sortBy(i => (uss(i), ties(i)))
            val sorted = order.map(uss(_)).toArray
            val gaps = Array.tabulate(sorted.length - 1)(i =>
              sorted(i + 1) - sorted(i))
            val n = gaps.length.toLong
            val sg = gaps.sum
            val sq = gaps.foldLeft(BigInt(0))((a, g) =>
              a + BigInt(g) * BigInt(g))
            val nD = n.toDouble
            val sgD = sg.toDouble
            val mean = sgD / nD
            val vr = math.max((sq.toDouble - sgD * sgD / nD) / nD, 0.0)
            val cv = if (mean > 0) Some(math.sqrt(vr) / mean) else None
            Iterator(CadenceRow(uid, n, mean, cv, cv.map(_ < cvFlag)))
          }
        })
      .toDF()
  }

  /** Streaming rolling-distinct-users deltas — the incremental DAU/WAU/
    * MAU lane (q192's batch semantics maintained across micro-batches):
    * per user, keyed state holds the distinct ACTIVITY-DAY set; each
    * micro-batch recomputes the user's coverage segments (activity days
    * whose gap is within `windowDays` merge — exactly the batch
    * [[graft.ops.EventOps.rollingDistinctUsers]] interval-union plan:
    * +1 at each segment start, −1 at segment end + windowDays) and
    * emits only the ±1 boundary-delta CHANGES versus its previous
    * state. A day-keyed sum of every emitted delta followed by one
    * calendar running sum reproduces the batch rolling count EXACTLY
    * (streaming == batch on the q192 config, StreamingAggSpec) — no
    * COUNT DISTINCT ever runs and no day is recomputed; state is one
    * day-array per user, per-batch output is bounded by the segments
    * the batch actually touched, not by history.
    *
    * → (day_num, delta) change stream, Update mode.
    */
  def streamingRollingDistinctDeltas(spark: SparkSession, events: DataFrame,
                                     windowDays: Int): DataFrame = {
    import spark.implicits._
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ev = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").cast("long").as("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("us"))
      .as[RetEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, batch: Iterator[RetEvent], state: GroupState[RetBuf]) => {
          val prev = state.getOption.map(_.uss).getOrElse(Array.empty[Long])
          val merged = (prev ++ batch.map(_.us)).distinct.sorted
          state.update(RetBuf(merged))
          // segment boundary deltas of a sorted day array — the batch
          // op's interval-union recipe, driver-free
          def deltas(a: Array[Long]): Map[Long, Long] =
            if (a.isEmpty) Map.empty
            else {
              val m = scala.collection.mutable.Map.empty[Long, Long]
              def add(k: Long, v: Long): Unit =
                m.updateWith(k)(o => Some(o.getOrElse(0L) + v))
              var segStart = a.head
              var prevDay = a.head
              for (d <- a.tail) {
                if (d - prevDay > windowDays - 1) {
                  add(segStart, 1L); add(prevDay + windowDays, -1L)
                  segStart = d
                }
                prevDay = d
              }
              add(segStart, 1L); add(prevDay + windowDays, -1L)
              m.toMap.filter(_._2 != 0L)
            }
          val oldD = deltas(prev)
          val newD = deltas(merged)
          (oldD.keySet ++ newD.keySet).iterator.flatMap { k =>
            val d = newD.getOrElse(k, 0L) - oldD.getOrElse(k, 0L)
            if (d != 0L) Iterator(DayDelta(k, d)) else Iterator.empty
          }
        })
      .toDF()
  }

  final case class RetEvent(user_id: Long, us: Long)
  final case class RetBuf(uss: Array[Long])
  final case class RetDelta(cohort_period: Long, period_offset: Long,
                            delta: Long)
  final case class DayDelta(day_num: Long, delta: Long)

  /** Incremental cohort retention — the streaming flavor of
    * [[graft.ops.EventOps.retentionCohorts]], maintained as a DELTA
    * stream (CDC-style): each micro-batch emits (cohort_period,
    * period_offset, ±1) corrections per user such that folding all
    * deltas (SUM(delta) GROUP BY cell) equals the batch retention
    * triangle over the same events, under ANY arrival order.
    *
    * Why deltas: a late-arriving EARLIER first event moves the user's
    * whole cohort — every cell previously credited to the user is wrong
    * and must be retracted, which an append-only emission cannot
    * express. State per user is the distinct event-time array (exact
    * duplicates collapse — they cannot change a cell); each update
    * recomputes the user's cell set from scratch and emits the
    * symmetric difference against the previous set.
    */
  def streamingRetentionDeltas(spark: SparkSession, events: DataFrame,
                               periodUs: Long): DataFrame = {
    import spark.implicits._
    require(periodUs > 0, "periodUs must be positive")
    val ev = events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"))
      .as[RetEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, batch: Iterator[RetEvent], state: GroupState[RetBuf]) => {
          val prev = state.getOption.map(_.uss).getOrElse(Array.empty[Long])
          val merged = (prev ++ batch.map(_.us)).distinct.sorted
          state.update(RetBuf(merged))
          // truncating division matches the batch op's `div` on the
          // non-negative (us - first) and epoch-positive first
          def cells(a: Array[Long]): Set[(Long, Long)] =
            if (a.isEmpty) Set.empty
            else {
              val f = a.head
              a.map(u => (f / periodUs, (u - f) / periodUs)).toSet
            }
          val oldC = cells(prev)
          val newC = cells(merged)
          (newC -- oldC).iterator.map { case (c, o) => RetDelta(c, o, 1L) } ++
            (oldC -- newC).iterator.map { case (c, o) => RetDelta(c, o, -1L) }
        })
      .toDF()
  }
}
