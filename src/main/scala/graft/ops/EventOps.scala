package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: ordered funnels and
  * cohort retention — the OLAP companions to the session windows and
  * as-of joins already in the inventory. Everything runs on exact
  * integer MICROsecond arithmetic (the events-fixture contract: DuckDB's
  * `epoch_us` sees the same integers, so whole trajectories replay).
  */
object EventOps {

  /** Ordered-funnel step times per user: t1 = first occurrence of
    * steps(0); t_{i+1} = first occurrence of steps(i) STRICTLY AFTER
    * t_i and within `windowUs` of t1 (the classic strict-order,
    * bounded-window funnel — re-orderings and stragglers past the
    * window do not convert). Users who stall keep NULLs from their
    * stalled step on.
    *
    * Plan shape: one filtered aggregation per step, each keyed by user
    * — k skinny (user, times) frames, k user-keyed joins, no windows
    * over the raw event stream and no event payload past the first
    * projection. At 100 TB the event scan dominates; everything joined
    * afterwards is user-cardinality.
    *
    * @param usCol BIGINT epoch-microseconds column
    * @return (userCol, t1, …, tk) — t_i NULL once the user stalls
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             usCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs > 0, "windowUs must be positive")
    // project the payload away up front — it also guarantees no event
    // column can collide with the accumulated t1..tk step columns
    val ev = events.select(col(userCol), col(typeCol), col(usCol))
    val frames = Seq.newBuilder[DataFrame]
    var acc = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(usCol)).as("t1"))
    frames += acc
    for (i <- 2 to steps.size) {
      val carried = (1 until i).map(j => s"t$j")
      acc = ev.filter(col(typeCol) === steps(i - 1))
        .join(acc, userCol)
        .filter(col(usCol) > col(s"t${i - 1}") &&
          col(usCol) <= col("t1") + windowUs)
        .groupBy((userCol +: carried).map(col): _*)
        .agg(min(col(usCol)).as(s"t$i"))
      frames += acc
    }
    val all = frames.result()
    // t_i is functionally determined by user (deterministic min chain),
    // so re-attaching stalled users is a user-keyed left-join chain
    all.tail.zipWithIndex.foldLeft(all.head) { case (res, (f, idx)) =>
      res.join(f.select(col(userCol), col(s"t${idx + 2}")),
        Seq(userCol), "left")
    }
  }

  /** Per-step funnel report over a [[funnel]] frame: one row per step
    * with the surviving-user count and the EXACT total time-from-t1
    * (BIGINT micros — averages are a division away and stay replayable).
    */
  def funnelReport(times: DataFrame, steps: Seq[String]): DataFrame =
    steps.indices.map { i =>
      val t = col(s"t${i + 1}")
      times.agg(
        lit(i + 1L).as("step"),
        lit(steps(i)).as("event_type"),
        count(t).as("n_users"),
        coalesce(sum(when(t.isNotNull, t - col("t1"))), lit(0L))
          .as("sum_us_from_t1"))
    }.reduce(_ unionByName _)

  /** Time-weighted average value per user — the step-function integral
    * (each value holds from its event until the next):
    * TWA = Σ v_i·(t_{i+1}−t_i) / (t_last − t_first). The per-segment
    * products route through DECIMAL(28,6)·duration (exact, order-
    * independent sum — a double Σ differs per partition order; 28 digits
    * keeps a |v| up to 10^22 from overflowing to NULL under ANSI-off),
    * and the final division exits via the VARCHAR→DOUBLE bridge (the q96
    * bit-exact decimal→double path). NULL-valued events are dropped
    * BEFORE the lead window — a missing measurement is not a value
    * change, so the prior value's segment extends across it and the
    * numerator and span_us stay consistent (counting a NULL segment's
    * duration in the denominator but not the numerator would silently
    * deflate the TWA). One lead window per user + one aggregation;
    * users with fewer than two (non-NULL-valued) events report NULL twa.
    *
    * → (userCol, n_events, span_us, twa)
    */
  def timeWeightedAvg(events: DataFrame, userCol: String, valueCol: String,
                      usCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col("__tie"))
    events
      .select(col(userCol), col(valueCol).cast("double").as("__v"),
        col(usCol).cast("long").as("__us"), col(tieCol).as("__tie"))
      .filter(col("__v").isNotNull)
      .withColumn("__next", lead(col("__us"), 1).over(w))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("span_us"),
        sum(when(col("__next").isNotNull,
          col("__v").cast("decimal(28,6)") *
            (col("__next") - col("__us")))).as("__num"))
      .select(col(userCol), col("n_events"), col("span_us"),
        when(col("span_us") > 0,
          col("__num").cast("string").cast("double") /
            col("span_us").cast("double")).as("twa"))
  }

  /** Conversion attribution, first- AND last-touch in one pass (the
    * marketing-analytics counterpart of the funnel): for every
    * conversion event, the earliest and latest touch event STRICTLY
    * before it (in (us, tie) order — same-instant ties resolve by the
    * unique tiebreaker, the [[transitions]] discipline) and within
    * `lookbackUs`. Conversions with no touch in the window keep NULLs
    * (unattributed — the honest bucket).
    *
    * Plan: touches and conversions are two skinny projections of one
    * scan; the per-user range join is bounded by the lookback window
    * (AQE handles per-user skew), and both models come from ONE
    * aggregation via struct-ordered min/max — no second pass.
    *
    * @return (userCol, conv_us, conv_tie, first_type, first_us,
    *         last_type, last_us)
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  usCol: String, tieCol: String, touchTypes: Seq[String],
                  convType: String, lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs touch types")
    require(!touchTypes.contains(convType),
      "conversion type must not be a touch type")
    require(lookbackUs > 0, "lookbackUs must be positive")
    val ev = events.select(col(userCol), col(typeCol),
      col(usCol).cast("long").as("__us"), col(tieCol).as("__tie"))
    val conv = ev.filter(col(typeCol) === convType)
      .select(col(userCol), col("__us").as("conv_us"),
        col("__tie").as("conv_tie"))
    val touch = ev.filter(col(typeCol).isin(touchTypes.map(lit): _*))
      .select(col(userCol).as("__tu"), col(typeCol).as("__tt"),
        col("__us").as("__tus"), col("__tie").as("__ttie"))
    val joined = conv.join(touch,
      col(userCol) === col("__tu") &&
        (col("__tus") < col("conv_us") ||
          (col("__tus") === col("conv_us") &&
            col("__ttie") < col("conv_tie"))) &&
        col("__tus") > col("conv_us") - lookbackUs,
      "left")
    joined.groupBy(col(userCol), col("conv_us"), col("conv_tie"))
      .agg(
        min(struct(col("__tus"), col("__ttie"), col("__tt"))).as("__f"),
        max(struct(col("__tus"), col("__ttie"), col("__tt"))).as("__l"))
      .select(col(userCol), col("conv_us"), col("conv_tie"),
        col("__f.__tt").as("first_type"), col("__f.__tus").as("first_us"),
        col("__l.__tt").as("last_type"), col("__l.__tus").as("last_us"))
  }

  /** Unordered (any-order) funnel — the lenient sibling of [[funnel]]:
    * anchored at the user's FIRST occurrence of steps.head, the user
    * converts a step when it occurs anywhere in [t1, t1 + windowUs]
    * regardless of order; t_i = earliest in-window occurrence.
    * Two aggregations (per-user anchor, then conditional mins), both
    * user-keyed — the anchor frame is user-cardinality, so it joins
    * hash-partitioned (NOT broadcast: at 100 TB "per user" is big).
    *
    * → (userCol, t1, …, tk, converted) — converted = every step seen
    */
  def unorderedFunnel(events: DataFrame, userCol: String, typeCol: String,
                      usCol: String, steps: Seq[String],
                      windowUs: Long): DataFrame = {
    require(steps.size >= 2, "unorderedFunnel needs at least two steps")
    require(windowUs > 0, "windowUs must be positive")
    val ev = events.select(col(userCol), col(typeCol),
      col(usCol).cast("long").as("__us"))
    val anchor = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("__us")).as("t1"))
    val stepCols = steps.tail.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s &&
        col("__us") >= col("t1") &&
        col("__us") <= col("t1") + windowUs, col("__us")))
        .as(s"t${i + 2}")
    }
    val agg = ev.join(anchor, userCol)
      .groupBy(col(userCol), col("t1"))
      .agg(stepCols.head, stepCols.tail: _*)
    agg.withColumn("converted",
      steps.indices.tail.map(i => col(s"t${i + 1}").isNotNull)
        .reduce(_ && _))
  }

  /** Growth-accounting lifecycle states (the new/active/resurrected/
    * dormant decomposition every growth team runs): per user, a period
    * spine from the user's FIRST active period to the corpus-wide last
    * period; each cell classifies as
    *
    *   new          — the user's first period (by definition active)
    *   active       — present this period AND the previous one
    *   resurrected  — present after one or more absent periods
    *   dormant      — absent (from first activity to the horizon)
    *
    * aggregated to one row per (period, state). Scale shape: distinct
    * (user, period) presence is one aggregation; the spine explode is
    * bounded by the observation span in periods (a few hundred), keyed
    * by user; the classify window is per user over its spine. The
    * corpus horizon is a one-row max that broadcasts.
    *
    * @param usCol BIGINT epoch-micros
    * @return (period, state, n_users)
    */
  def lifecycleStates(events: DataFrame, userCol: String, usCol: String,
                      periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val up = events
      .select(col(userCol), expr(s"`$usCol` div ${periodUs}L").as("p"))
      .distinct()
    val firsts = up.groupBy(userCol).agg(min("p").as("__first"))
    val horizon = up.agg(max("p").as("__last"))
    val spine = firsts.crossJoin(broadcast(horizon))
      .select(col(userCol), col("__first"),
        explode(sequence(col("__first"), col("__last"))).as("p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy("p")
    val classified = spine
      .join(up.withColumn("__present", lit(true)), Seq(userCol, "p"), "left")
      .withColumn("__present", coalesce(col("__present"), lit(false)))
      .withColumn("__prev", lag(col("__present"), 1).over(w))
      .withColumn("state",
        when(!col("__present"), lit("dormant"))
          .when(col("p") === col("__first"), lit("new"))
          .when(col("__prev"), lit("active"))
          .otherwise(lit("resurrected")))
    classified.groupBy(col("p").as("period"), col("state"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-type transition matrix over per-user trajectories — the
    * first-order Markov summary of product flows (what follows what,
    * and with what probability): consecutive-event pairs via ONE lead
    * window per user (ordered by time with an explicit unique
    * tiebreaker — same-instant events otherwise make the trajectory,
    * and therefore the matrix, partitioning-dependent), then a
    * (from, to) aggregation; probabilities normalize per from-type
    * with a partitioned window over the |types|²-bounded count frame.
    * Event payload dies at the first projection.
    *
    * @param tieCol unique per-event column (e.g. event_id) ordering
    *               same-timestamp events deterministically
    * @return (from_type, to_type, n, p)
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  usCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(usCol), col(tieCol))
    val counts = events
      .select(col(userCol), col(typeCol), col(usCol), col(tieCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val perFrom = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    counts.withColumn("p",
      col("n").cast("double") / sum("n").over(perFrom).cast("double"))
  }

  /** Step-to-step conversion rates over a [[funnelReport]], with the
    * Wilson score lower bound (Wilson 1927 — the interval that stays
    * honest at small counts and extreme rates, unlike the normal
    * approximation): per step, rate = n_i / n_{i−1} and the z=1.96
    * lower bound, both rounded to 6 decimals (the shared IEEE
    * expression tree evaluates identically cross-engine; rounding
    * absorbs nothing but documents the contract). Runs on the k-row
    * report plane — the window is over steps, not events.
    *
    * → report columns + (rate, wilson_low), NULL at step 1
    */
  def funnelRates(report: DataFrame, z: Double = 1.96): DataFrame = {
    // k-row report plane: bounded single-partition window by construction
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(report))
      .orderBy("step")
    report
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .withColumn("rate",
        when(col("__prev") > 0,
          round(col("n_users").cast("double") /
            col("__prev").cast("double"), 6)))
      .withColumn("wilson_low",
        when(col("__prev") > 0, round(expr(
          s"""(CAST(n_users AS DOUBLE) / CAST(__prev AS DOUBLE)
             | + $z * $z / (2 * CAST(__prev AS DOUBLE))
             | - $z * SQRT(
             |     CAST(n_users AS DOUBLE) / CAST(__prev AS DOUBLE)
             |       * (1 - CAST(n_users AS DOUBLE) / CAST(__prev AS DOUBLE))
             |       / CAST(__prev AS DOUBLE)
             |     + $z * $z
             |       / (4 * CAST(__prev AS DOUBLE) * CAST(__prev AS DOUBLE))))
             | / (1 + $z * $z / CAST(__prev AS DOUBLE))""".stripMargin), 6)))
      .drop("__prev")
  }

  /** Weekly-style cohort retention triangle: cohort = the user's first
    * event's absolute period index (epoch-micros div period), offset =
    * full periods since that first event; one row per (cohort, offset)
    * with the distinct active users. Two shuffles total: the per-user
    * first-event aggregation and the cohort-cell aggregation — the
    * event payload never travels, only (user, us).
    */
  def retentionCohorts(events: DataFrame, userCol: String, usCol: String,
                       periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val first = events.groupBy(col(userCol))
      .agg(min(col(usCol)).as("__first"))
    events.select(col(userCol), col(usCol))
      .join(first, userCol)
      .select(col(userCol),
        expr(s"__first div ${periodUs}L").as("cohort_period"),
        expr(s"(`$usCol` - __first) div ${periodUs}L").as("period_offset"))
      .groupBy("cohort_period", "period_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Per-user inter-event cadence profile — the bot/automation signal
    * (machine traffic fires on timers: near-constant gaps, so the
    * coefficient of variation of inter-event times collapses toward 0,
    * while human cadence is bursty, CV ≳ 1 — the classic
    * traffic-quality heuristic): per user the ordered inter-event gaps
    * (one lag window in (us, tie) order — the [[transitions]] tiebreak
    * discipline), then n, mean, std and CV from EXACT sums: Σg BIGINT,
    * Σg² DECIMAL(38,0) (a 30-day gap in micros squares to ~10^25, past
    * BIGINT), both exiting over the VARCHAR→DOUBLE bridge into a FIXED
    * sequence of IEEE ops — variance = (Σg² − (Σg)²/n)/n clamped at 0
    * (float cancellation can dip an all-equal-gaps user a hair below),
    * std = sqrt (correctly rounded, engine-independent), cv = std/mean.
    *
    * One window + one aggregation, both user-partitioned; only
    * (user, us, tie) travels. Users with fewer than 2 events have no
    * gaps and drop out; mean = 0 (all events same instant) reports
    * NULL cv.
    *
    * → (userCol, n_gaps, mean_gap_us, cv, is_regular = cv < cvFlag)
    */
  /** Gap-based batch sessionization (the classic web-analytics operator;
    * grouping identical to Structured Streaming's
    * `session_window(ts, gap)` — asserted streaming==batch in
    * StreamingAggSpec): an event starts a NEW session when the same
    * user's previous event (in (us, tie) order) is `gapUs` or more
    * micros earlier; a gap strictly under `gapUs` keeps merging, which
    * matches session_window's half-open [ts, ts+gap) extension rule.
    * Session ids are DETERMINISTIC — (user, session_seq) with
    * session_seq the running count of session starts — never UUIDs, so
    * the result is layout-invariant and SQL-replayable.
    *
    * Scale shape: one lag window + one running-sum window over the SAME
    * user partitioning (a single shuffle on the user key, shared by
    * both specs), no self-joins; rows with NULL user or time are
    * excluded.
    *
    * → input rows + (session_seq) — per event.
    */
  def sessionize(events: DataFrame, userCol: String, usCol: String,
                 tieCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be > 0, got $gapUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col(tieCol))
    events
      .withColumn("__us", col(usCol).cast("long"))
      .filter(col(userCol).isNotNull && col("__us").isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("__prev").isNull ||
            col("__us") - col("__prev") >= gapUs, 1L).otherwise(0L))
          .over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .drop("__us", "__prev")
  }

  /** Per-session statistics off [[sessionize]]: one aggregation keyed by
    * (user, session_seq) — bounds, duration, event count, and the exact
    * DECIMAL value sum exiting over the VARCHAR bridge (the repo's
    * cross-engine double discipline).
    *
    * → (userCol, session_seq, start_us, end_us, duration_us, n_events,
    *   sum_value)
    */
  def sessionStats(events: DataFrame, userCol: String, usCol: String,
                   tieCol: String, valueCol: String,
                   gapUs: Long): DataFrame =
    sessionize(events, userCol, usCol, tieCol, gapUs)
      .select(col(userCol), col("session_seq"),
        col(usCol).cast("long").as("__us"),
        coalesce(col(valueCol).cast("double").cast("decimal(18,6)"),
          lit(0).cast("decimal(18,6)")).as("__v"))
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("__v")).as("__sv"))
      .select(col(userCol), col("session_seq"), col("start_us"),
        col("end_us"), (col("end_us") - col("start_us")).as("duration_us"),
        col("n_events"),
        col("__sv").cast("string").cast("double").as("sum_value"))

  def cadenceProfile(events: DataFrame, userCol: String, usCol: String,
                     tieCol: String, cvFlag: Double = 0.1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col("__tie"))
    val gaps = events
      .select(col(userCol), col(usCol).cast("long").as("__us"),
        col(tieCol).as("__tie"))
      .withColumn("__g", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__g").isNotNull)
    val agg = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("__sg"),
        sum(col("__g").cast("decimal(38,0)") * col("__g")).as("__sq"))
    val nD = col("n_gaps").cast("double")
    val sgD = col("__sg").cast("double")
    val sqD = col("__sq").cast("string").cast("double")
    val meanD = sgD / nD
    val varD = greatest((sqD - (sgD * sgD) / nD) / nD, lit(0.0))
    agg.select(col(userCol), col("n_gaps"), meanD.as("mean_gap_us"),
        when(meanD > 0, sqrt(varD) / meanD).as("cv"))
      .withColumn("is_regular", col("cv") < cvFlag)
  }

  /** Per-series linear trend over daily volumes — grouped OLS of count
    * on day index with the slope's t-statistic, the "which series are
    * growing/decaying, and is it signal" monitor (the q208 regression
    * recipe, grouped and with inference):
    *
    *   slope = cov(d, n)/var(d),  t = slope / se,
    *   se² = (SSE/(n−2)) / Σ(d−d̄)²
    *
    * Exactness: day indices and counts are integers on a zero-filled
    * spine (gap days are real zeros — dropping them biases the trend
    * up); all five moments are exact integer/DECIMAL(38,0) sums
    * exiting the VARCHAR bridge into a fixed IEEE sequence.
    *
    * → (typeCol, n_days, slope, intercept, t_stat, trending) — t/flag
    *   NULL when var(d)=0 or n_days < 3; trending = |t| > 2.
    */
  def dailyTrend(events: DataFrame, typeCol: String,
                 tsCol: String): DataFrame = {
    val daily = events
      .select(col(typeCol), to_date(col(tsCol)).as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(col(typeCol), col("__d"))
      .agg(count(lit(1)).as("__n"))
    val spine = daily
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__d"))
    val series = daily.select(col(typeCol)).distinct()
    val z = series.crossJoin(spine)
      .join(daily, Seq(typeCol, "__d"), "left")
      .select(col(typeCol),
        datediff(col("__d"), lit("1970-01-01")).cast("long").as("__x"),
        coalesce(col("__n"), lit(0L)).as("__y"))
    val m = z.groupBy(col(typeCol)).agg(
      count(lit(1)).as("n_days"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"),
      sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"),
      sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__syy"))
    def d(name: String) = col(name).cast("string").cast("double")
    val nD = col("n_days").cast("double")
    val sxD = col("__sx").cast("double")
    val syD = col("__sy").cast("double")
    val cov = d("__sxy") - sxD * syD / nD
    val vx = d("__sxx") - sxD * sxD / nD
    val vy = d("__syy") - syD * syD / nD
    val slope = cov / vx
    val sse = vy - slope * cov // SSE = Syy − b·Sxy (centered)
    val se = sqrt((sse / (nD - lit(2.0))) / vx)
    m.select(col(typeCol), col("n_days"),
        when(vx > 0, slope).as("slope"),
        when(vx > 0, syD / nD - slope * sxD / nD).as("intercept"),
        when(vx > 0 && col("n_days") > 2 && sse > 0, slope / se)
          .as("t_stat"))
      .withColumn("trending", abs(col("t_stat")) > 2.0)
  }

  /** Lead–lag cross-correlation between two event series (the
    * econometric CCF): Pearson r between x's daily count and y's daily
    * count shifted by k days, for every |k| ≤ maxLag — "does X lead
    * Y?" answered by where the correlation peaks. Positive k means
    * y LAGS x by k days (x leads).
    *
    * Exactness: daily counts are integers on a zero-filled day spine
    * (gap days count 0 — dropping them would bias r); each lag's five
    * moments are exact integer/DECIMAL(38,0) sums that exit over the
    * VARCHAR bridge into the fixed Pearson sequence, engine-identical.
    *
    * Scale shape: one aggregation to the day plane; the 2·maxLag+1
    * lagged pairings are joins ON that plane (days × lags rows — tiny
    * at any corpus size).
    *
    * → (lag, n_days, r) — r NULL when either side has zero variance
    *   in the overlap.
    */
  def leadLagCorrelation(events: DataFrame, typeCol: String, typeX: String,
                         typeY: String, tsCol: String,
                         maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag in [1,60], got $maxLag")
    val daily = events
      .select(col(typeCol).as("__t"), to_date(col(tsCol)).as("__d"))
      .filter(col("__d").isNotNull &&
        (col("__t") === typeX || col("__t") === typeY))
      .groupBy(col("__d"))
      .agg(sum(when(col("__t") === typeX, 1L).otherwise(0L)).as("__x"),
        sum(when(col("__t") === typeY, 1L).otherwise(0L)).as("__y"))
    val spine = daily
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__d"))
    val d = spine.join(daily, Seq("__d"), "left")
      .select(datediff(col("__d"), lit("1970-01-01")).cast("long")
        .as("__dn"),
        coalesce(col("__x"), lit(0L)).as("__x"),
        coalesce(col("__y"), lit(0L)).as("__y"))
      .localCheckpoint() // tiny day plane, reused by every lag
    val ks = d.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    val paired = ks.crossJoin(d.select(col("__dn"), col("__x")))
      .join(d.select(col("__dn").as("__dn2"), col("__y")),
        col("__dn2") === col("__dn") + col("lag"))
    val m = paired.groupBy("lag").agg(
      count(lit(1)).as("n_days"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"),
      sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"),
      sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__syy"))
    def d2(name: String) = col(name).cast("string").cast("double")
    val nD = col("n_days").cast("double")
    val cov = nD * d2("__sxy") - col("__sx").cast("double") *
      col("__sy").cast("double")
    val vx = nD * d2("__sxx") - col("__sx").cast("double") *
      col("__sx").cast("double")
    val vy = nD * d2("__syy") - col("__sy").cast("double") *
      col("__sy").cast("double")
    m.select(col("lag"), col("n_days"),
      when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))).as("r"))
  }

  /** CUSUM change-point detection per series (Page, Biometrika 1954):
    * cumulative sum of deviations of the daily mean from the series'
    * global mean — a level shift makes |CUSUM| peak AT the change
    * point, which flat noise never does. The argmax day (ties → the
    * earliest) is the estimated change point, the classic offline
    * single-change localizer.
    *
    * Exactness: daily and global sums ride DECIMAL(18,6) and exit over
    * the VARCHAR bridge, so both means are engine-identical doubles;
    * each deviation is cast back to DECIMAL(18,6) before the running
    * sum (order-independent), and the argmax is a (|cusum| DESC, day)
    * row_number — no float comparisons against a stored max.
    *
    * Scale shape: one aggregation to the (series, day) plane; every
    * window is series-partitioned on that plane.
    *
    * → (typeCol, day, daily_mean, cusum, is_cp) — one row per
    *   (series, active day)
    */
  def cusumChangePoint(events: DataFrame, typeCol: String,
                       valueCol: String, tsCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol), to_date(col(tsCol)).as("day"),
        col(valueCol).cast("double").cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull && col("day").isNotNull)
      .groupBy(col(typeCol), col("day"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
    val wt = W.partitionBy(col(typeCol))
    val wRun = W.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, 0)
    daily
      .withColumn("daily_mean",
        col("__s").cast("string").cast("double") / col("__n").cast("double"))
      .withColumn("__stot", sum(col("__s")).over(wt))
      .withColumn("__ntot", sum(col("__n")).over(wt))
      .withColumn("__gmean", col("__stot").cast("string").cast("double") /
        col("__ntot").cast("double"))
      .withColumn("__dev",
        (col("daily_mean") - col("__gmean")).cast("decimal(18,6)"))
      .withColumn("cusum",
        sum(col("__dev")).over(wRun).cast("string").cast("double"))
      .withColumn("is_cp", row_number().over(
        W.partitionBy(col(typeCol))
          .orderBy(abs(col("cusum")).desc, col("day"))) === 1)
      .select(col(typeCol), col("day"), col("daily_mean"), col("cusum"),
        col("is_cp"))
  }

  /** Frequent k=3 behavior motifs — the third-order sibling of
    * [[transitions]]: per user the (t, next, next²) trigrams from TWO
    * lead windows over one (us, tie)-ordered pass (no self-joins —
    * consecutive triples, the n-gram trick on trajectories), then
    * global motif counts and each motif's share among trigrams starting
    * with the same first step. Same-instant ties order by the unique
    * tiebreaker, so trajectories — and therefore motif counts — are
    * deterministic.
    *
    * → (t0, t1, t2, n, share_of_t0) sorted by the caller
    */
  def trigramMotifs(events: DataFrame, userCol: String, typeCol: String,
                    usCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col("__tie"))
    val tri = events
      .select(col(userCol), col(typeCol).as("t0"),
        col(usCol).cast("long").as("__us"), col(tieCol).as("__tie"))
      .withColumn("t1", lead(col("t0"), 1).over(w))
      .withColumn("t2", lead(col("t0"), 2).over(w))
      .filter(col("t2").isNotNull)
    val counts = tri.groupBy("t0", "t1", "t2").agg(count(lit(1)).as("n"))
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(col("t0"))
    counts.withColumn("share_of_t0",
      col("n").cast("double") / sum(col("n")).over(w0).cast("double"))
  }

  /** Item co-occurrence via bipartite projection — the
    * "users-who-touched-X-also-touched-Y" recommender primitive — with
    * the DEGREE CAP that makes it survive scale: projecting a bipartite
    * graph is quadratic in user degree, so one celebrity user touching
    * 10^5 items would alone emit 5·10^9 pairs; users above
    * `maxUserDegree` are excluded OUTRIGHT (deterministic and
    * SQL-replayable, unlike sampling — and a user touching everything
    * carries no affinity signal anyway, the classic co-occurrence
    * argument). Pair support counts then map-side combine to the
    * item-pair plane, and Jaccard affinity comes from the capped item
    * popularities.
    *
    * → (item_a, item_b, n_users, jaccard) for item_a < item_b with
    *   support ≥ minSupport
    */
  def itemCooccurrence(interactions: DataFrame, userCol: String,
                       itemCol: String, maxUserDegree: Int = 50,
                       minSupport: Long = 2L): DataFrame = {
    require(maxUserDegree >= 2, "maxUserDegree must be >= 2")
    val ui = interactions
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
    val deg = ui.groupBy("__u").agg(count(lit(1)).as("__deg"))
    val kept = ui.join(deg.filter(col("__deg") <= maxUserDegree), "__u")
      .select(col("__u"), col("__i"))
    val pop = kept.groupBy(col("__i")).agg(count(lit(1)).as("__pop"))
    val pairs = kept.alias("x").join(kept.alias("y"),
        col("x.__u") === col("y.__u") && col("x.__i") < col("y.__i"))
      .select(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
    pairs
      .join(pop.select(col("__i").as("item_a"), col("__pop").as("__pa")),
        "item_a")
      .join(pop.select(col("__i").as("item_b"), col("__pop").as("__pb")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_users"),
        (col("n_users").cast("double") /
          (col("__pa") + col("__pb") - col("n_users")).cast("double"))
          .as("jaccard"))
  }

  /** Per-user trajectory surprisal under the corpus transition model —
    * the sequence-anomaly detector (an account whose click-path the
    * global first-order Markov chain finds improbable is a bot, an
    * attacker, or a UI bug): for each user, the mean negative
    * log-likelihood of their consecutive transitions,
    *
    *   NLL(u) = − (1/T_u) Σ_t ln P(next_t | cur_t),
    *   P(j|i) = n_ij / Σ_j n_ij   (global counts)
    *
    * Each term is ONE ln of a ratio of exact integers (the PMI recipe)
    * cast to DECIMAL(18,12); per-user sums are order-independent and
    * the division exits over the VARCHAR bridge. Every observed
    * transition has a positive global count by construction (it
    * contributes to the model), so no smoothing is needed and no
    * ln(0) can occur.
    *
    * Scale shape: one lead window for the pairs, the K×K transition
    * matrix joins back onto them (broadcast by default — bounded by
    * event-type cardinality squared; set `broadcastModel = false` for
    * a high-cardinality type column, where K² would blow the broadcast
    * and a shuffle join on (from, to) is the right plan), one
    * user-keyed aggregation.
    *
    * → (userCol, n_transitions, avg_nll) — users with no transitions
    *   are absent.
    */
  def trajectorySurprisal(events: DataFrame, userCol: String,
                          typeCol: String, usCol: String,
                          tieCol: String,
                          broadcastModel: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col("__tie"))
    val pairs = events
      .select(col(userCol), col(typeCol).as("__from"),
        col(usCol).cast("long").as("__us"), col(tieCol).as("__tie"))
      .withColumn("__to", lead(col("__from"), 1).over(w))
      .filter(col("__to").isNotNull)
      .select(col(userCol), col("__from"), col("__to"))
    val model = pairs.groupBy("__from", "__to")
      .agg(count(lit(1)).as("__nij"))
      .withColumn("__ni", sum(col("__nij")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__from"))))
    val maybeModel = if (broadcastModel) broadcast(model) else model
    pairs.join(maybeModel, Seq("__from", "__to"))
      .withColumn("__term",
        log(col("__nij").cast("double") / col("__ni").cast("double"))
          .cast("decimal(18,12)"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_transitions"),
        (-sum(col("__term"))).as("__s"))
      .select(col(userCol), col("n_transitions"),
        (col("__s").cast("string").cast("double") /
          col("n_transitions").cast("double")).as("avg_nll"))
  }

  /** RFM customer segmentation (Hughes 1994 — the marketing-analytics
    * classic): per user Recency (micros from last activity to the
    * corpus horizon), Frequency (event count) and Monetary (exact
    * DECIMAL value sum), each scored into `nBuckets` quantile buckets
    * (5 = best: most recent / most frequent / highest value) with
    * [[ScaleOps.rankBuckets]] — ntile-identical but never funneling
    * the user plane through one task, deterministic because every
    * ordering carries the user id as the final tiebreak.
    *
    * One corpus aggregation to the user plane; three rank-bucket
    * passes + two user-keyed joins on that plane.
    *
    * → (userCol, recency_us, frequency, monetary, r_score, f_score,
    *   m_score, rfm) — monetary as DOUBLE over the VARCHAR bridge,
    *   rfm = r·100 + f·10 + m.
    */
  def rfmSegments(events: DataFrame, userCol: String, valueCol: String,
                  usCol: String, nBuckets: Int = 5,
                  numPartitions: Int = 8): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val perUser = events
      .select(col(userCol), col(usCol).cast("long").as("__us"),
        coalesce(col(valueCol).cast("double").cast("decimal(18,6)"),
          lit(0).cast("decimal(18,6)")).as("__v"))
      .filter(col(userCol).isNotNull && col("__us").isNotNull)
      .groupBy(col(userCol))
      .agg(max(col("__us")).as("__last"), count(lit(1)).as("frequency"),
        sum(col("__v")).as("__m"))
    val horizon = perUser.agg(max(col("__last")).as("__h"))
    val base = perUser.crossJoin(broadcast(horizon))
      .select(col(userCol), (col("__h") - col("__last")).as("recency_us"),
        col("frequency"), col("__m"))
      .localCheckpoint() // feeds three rank-bucket passes
    // recency: LOWER is better, so rank by -recency ascending = score 5
    // for the most recent; ties broken by user id everywhere
    val r = ScaleOps.rankBuckets(
      base.select(col(userCol), (-col("recency_us")).as("__k")),
      Seq("__k", userCol), nBuckets, numPartitions, "r_score")
      .select(col(userCol), col("r_score"))
    val f = ScaleOps.rankBuckets(
      base.select(col(userCol), col("frequency").as("__k")),
      Seq("__k", userCol), nBuckets, numPartitions, "f_score")
      .select(col(userCol), col("f_score"))
    val m = ScaleOps.rankBuckets(
      base.select(col(userCol), col("__m").as("__k")),
      Seq("__k", userCol), nBuckets, numPartitions, "m_score")
      .select(col(userCol), col("m_score"))
    base.join(r, Seq(userCol)).join(f, Seq(userCol)).join(m, Seq(userCol))
      .select(col(userCol), col("recency_us"), col("frequency"),
        col("__m").cast("string").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm"))
  }

  /** Hour-of-week seasonality profile with a uniformity χ² — the
    * traffic-shape diagnostic (organic product traffic has strong
    * diurnal/weekly structure; scripted or backfilled traffic is flat,
    * the complement of [[cadenceProfile]]'s per-user view): per series,
    * counts over the 168 (weekday, hour) cells plus χ² against the
    * uniform baseline — every cell reported (absent cells at 0, their
    * term is the largest). χ² terms are engine-identical doubles summed
    * through DECIMAL(28,6) — a fully concentrated 10^10-event series
    * tops 10^12, past 18,6; weekday is ISO (1 = Monday) from UTC event
    * time. The rejection threshold is χ² ppf(0.999, df=167) = 229.215.
    *
    * Scale shape: one aggregation to the (series × 168)-cell plane;
    * the spine join and χ² run there.
    *
    * → (typeCol, weekday, hour, n_obs, expected, chi2, flat_rejected)
    */
  def hourOfWeekProfile(events: DataFrame, typeCol: String,
                        tsCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val counts = events
      .select(col(typeCol), dayofweek(col(tsCol)).as("__dow"),
        hour(col(tsCol)).as("hour"))
      .filter(col("__dow").isNotNull)
      // dayofweek is 1=Sunday; re-map to ISO 1=Monday..7=Sunday
      .withColumn("weekday",
        when(col("__dow") === 1, 7).otherwise(col("__dow") - 1))
      .groupBy(col(typeCol), col("weekday"), col("hour"))
      .agg(count(lit(1)).as("n_obs"))
    val spark0 = events.sparkSession
    val spine = spark0.range(1, 8).select(col("id").cast("int").as("weekday"))
      .crossJoin(spark0.range(0, 24).select(col("id").cast("int").as("hour")))
    val series = counts.select(col(typeCol)).distinct()
    val wT = W.partitionBy(col(typeCol))
    series.crossJoin(spine)
      .join(counts, Seq(typeCol, "weekday", "hour"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("__tot", sum(col("n_obs")).over(wT))
      .withColumn("expected", col("__tot").cast("double") / lit(168.0))
      .withColumn("__term",
        (((col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected"))) /
          col("expected")).cast("decimal(28,6)"))
      .withColumn("chi2",
        sum(col("__term")).over(wT).cast("string").cast("double"))
      // chi2 ppf(0.999, df=167) = 229.2146 (incomplete-gamma inversion)
      .withColumn("flat_rejected", col("chi2") > lit(229.215))
      .select(col(typeCol), col("weekday").cast("long").as("weekday"),
        col("hour").cast("long").as("hour"), col("n_obs"),
        col("expected"), col("chi2"), col("flat_rejected"))
  }

  /** Association rules over the [[itemCooccurrence]] plane (Agrawal &
    * Srikant, VLDB 1994 — support/confidence/lift, the market-basket
    * classics): each undirected co-occurrence pair yields BOTH directed
    * rules a→b and b→a, with
    *
    *   support    = n(a,b) / N       (N = capped user universe)
    *   confidence = n(a,b) / pop(a)
    *   lift       = confidence / (pop(b) / N)
    *
    * — all from integers the co-occurrence pass already produced, so
    * the readout is three IEEE divisions per rule. Same degree-cap
    * scale guard; lift > 1 = genuinely associated, < 1 = substitutes.
    *
    * → (antecedent, consequent, n_users, support, confidence, lift)
    */
  def associationRules(interactions: DataFrame, userCol: String,
                       itemCol: String, maxUserDegree: Int = 50,
                       minSupport: Long = 2L): DataFrame = {
    val ui = interactions
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
    val deg = ui.groupBy("__u").agg(count(lit(1)).as("__deg"))
    val kept = ui.join(deg.filter(col("__deg") <= maxUserDegree), "__u")
      .select(col("__u"), col("__i"))
      .localCheckpoint() // shared by N, popularities and the pair join
    val nUsers = kept.select(col("__u")).distinct()
      .agg(count(lit(1)).as("__N0"))
    val pop = kept.groupBy(col("__i")).agg(count(lit(1)).as("__pop"))
    val und = kept.alias("x").join(kept.alias("y"),
        col("x.__u") === col("y.__u") && col("x.__i") < col("y.__i"))
      .select(col("x.__i").as("antecedent"), col("y.__i").as("consequent"))
      .groupBy("antecedent", "consequent").agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
    val directed = und.unionByName(und.select(
      col("consequent").as("antecedent"), col("antecedent").as("consequent"),
      col("n_users")))
    val nD = col("__N0").cast("double")
    directed
      .join(pop.select(col("__i").as("antecedent"), col("__pop").as("__pa")),
        "antecedent")
      .join(pop.select(col("__i").as("consequent"), col("__pop").as("__pb")),
        "consequent")
      .crossJoin(broadcast(nUsers))
      .select(col("antecedent"), col("consequent"), col("n_users"),
        (col("n_users").cast("double") / nD).as("support"),
        (col("n_users").cast("double") / col("__pa").cast("double"))
          .as("confidence"),
        ((col("n_users").cast("double") / col("__pa").cast("double")) /
          (col("__pb").cast("double") / nD)).as("lift"))
  }

  /** Two-proportion A/B experiment readout: users are assigned to arms
    * by [[Curation.hashBucket]](user, 2) — the deterministic,
    * re-run-stable, SQL-replayable assignment (never rand()) — a user
    * CONVERTS if they ever emit `convType`, and the readout is the
    * standard pooled two-proportion z-test
    *
    *   z = (r_a − r_b) / √( p̂(1−p̂)(1/n_a + 1/n_b) ),  p̂ pooled
    *
    * with |z| > 1.96 the α=0.05 verdict. Everything reduces to FOUR
    * integers (per-arm users and conversions) via two aggregations —
    * the z arithmetic is a fixed IEEE sequence on top, so the whole
    * readout hash-matches across engines.
    *
    * → one row (n_a, conv_a, rate_a, n_b, conv_b, rate_b, lift, z,
    *   significant); z NULL when the pooled variance is 0 (all or none
    *   convert) or an arm is empty.
    */
  def abTestReport(events: DataFrame, userCol: String, typeCol: String,
                   convType: String): DataFrame = {
    val perUser = events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"))
      .filter(col("__u").isNotNull)
      .groupBy("__u")
      .agg(max(when(col("__t") === convType, 1L).otherwise(0L)).as("__c"))
      .select(Curation.hashBucket(col("__u"), 2).as("__arm"), col("__c"))
    val s = perUser.agg(
      coalesce(sum(when(col("__arm") === 0, 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("__arm") === 0, col("__c"))), lit(0L))
        .as("conv_a"),
      coalesce(sum(when(col("__arm") === 1, 1L)), lit(0L)).as("n_b"),
      coalesce(sum(when(col("__arm") === 1, col("__c"))), lit(0L))
        .as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ra = col("conv_a").cast("double") / na
    val rb = col("conv_b").cast("double") / nb
    val pooled = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
    val se = sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb))
    // empty-arm rates NULL, not NaN: 0.0/0.0 is NaN in Spark but NULL in
    // ANSI engines — guard like lift/z so the report is engine-identical
    s.select(col("n_a"), col("conv_a"),
        when(col("n_a") > 0, ra).as("rate_a"),
        col("n_b"), col("conv_b"),
        when(col("n_b") > 0, rb).as("rate_b"),
        when(col("n_a") > 0 && col("n_b") > 0, ra - rb).as("lift"),
        when(col("n_a") > 0 && col("n_b") > 0 && se > 0, (ra - rb) / se)
          .as("z"))
      .withColumn("significant", abs(col("z")) > 1.96)
  }

  /** Exponentially-weighted moving average per user, EXACT: the
    * adjusted-EWMA (normalize by the weights actually present — the
    * pandas `adjust=True` convention) truncated at `lags` terms,
    *
    *   y_t = Σ_{i<lags} r^i·v_{t−i} / Σ_{i<lags, present} r^i,
    *   r = 1 − α,  α = alphaNum/alphaDen rational
    *
    * computed with SCALED INTEGER weights u_i = (den−num)^i·den^{L−1−i}
    * (for α=1/4, L=8: 16384, 12288, …, 2187) so every product is a
    * DECIMAL(18,6)·BIGINT exact term and the result replays bit-for-bit
    * in any engine — a float r^i recurrence drifts per evaluation
    * order. Truncation at L lags discards a (1−α)^L ≤ 10% weight tail
    * (α=1/4, L=8) that the normalization re-absorbs.
    *
    * One user-partitioned window carrying L lags — no self-joins, no
    * recurrence state; NULL values drop out of numerator AND
    * denominator (a missing measurement is not a zero).
    *
    * → input row + (ewma) — NULL only when all L lags are NULL.
    */
  def ewmaSmooth(events: DataFrame, userCol: String, valueCol: String,
                 usCol: String, tieCol: String,
                 alphaNum: Int = 1, alphaDen: Int = 4,
                 lags: Int = 8): DataFrame = {
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    require(lags >= 1 && lags <= 20, s"lags must be in [1,20], got $lags")
    val r = alphaDen - alphaNum
    // exact BigInt weights: a double pow is already inexact past 2^53,
    // which would silently break the rational-weight contract long
    // before the BIGINT bound
    val uBig = (0 until lags).map(i =>
      BigInt(r).pow(i) * BigInt(alphaDen).pow(lags - 1 - i))
    require(uBig.forall(_ <= BigInt(Long.MaxValue)),
      s"scaled weights overflow BIGINT: alpha=$alphaNum/$alphaDen lags=$lags")
    val u = uBig.map(_.toLong)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(usCol), col(tieCol))
    val lagged = events.withColumn("__vd",
      col(valueCol).cast("double").cast("decimal(18,6)"))
    val num = (0 until lags).map { i =>
      coalesce(lag(col("__vd"), i).over(w) * lit(u(i)),
        lit(0).cast("decimal(38,6)"))
    }.reduce(_ + _)
    val den = (0 until lags).map { i =>
      when(lag(col("__vd"), i).over(w).isNotNull, lit(u(i)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    lagged
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma",
        when(col("__den") > 0,
          col("__num").cast("string").cast("double") /
            col("__den").cast("double")))
      .drop("__vd", "__num", "__den")
  }

  /** Kaplan–Meier survival curve over user lifetimes (Kaplan & Meier,
    * JASA 1958 — the right-censoring-aware retention curve; a naive
    * "fraction still active after t days" silently treats
    * recently-joined users as churned): per user, lifetime t = last −
    * first activity day + 1; a user whose last activity is ≥
    * `churnGapDays` before the observation end (corpus max day) is a
    * CHURN EVENT at t, anyone active since is CENSORED at the
    * observation horizon. At each duration t_i: n_i at risk (lifetime
    * ≥ t_i), d_i deaths, Ŝ(t_i) = Π_{j≤i} (1 − d_j/n_j).
    *
    * Exactness: the setup (lifetimes, deaths, censors, at-risk counts)
    * is pure integer arithmetic; the product rides the q106 ln →
    * DECIMAL(18,12) recipe as a window cumsum (order-independent,
    * bit-replayable), exiting through exp. A duration where every
    * at-risk user dies sends the curve to EXACTLY 0 via a prefix-max
    * flag instead of ln(0).
    *
    * Scale shape: ONE aggregation over the corpus to the per-user
    * (first, last) plane, one more to the ≤|distinct-durations| frame;
    * every window runs on that tiny duration plane (days, not rows).
    *
    * → (t_days, n_risk, n_deaths, n_censored, survival), one row per
    *   observed lifetime, ascending; survival is flat on censor-only
    *   rows.
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  churnGapDays: Int = 7): DataFrame = {
    require(churnGapDays >= 1, s"churnGapDays must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val perUser = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .filter(col("__u").isNotNull && col("__d").isNotNull)
      .groupBy("__u").agg(min(col("__d")).as("__f"), max(col("__d")).as("__l"))
    val horizon = perUser.agg(max(col("__l")).as("__m"))
    val durations = perUser.crossJoin(broadcast(horizon))
      .select(
        when(datediff(col("__m"), col("__l")) >= churnGapDays,
          datediff(col("__l"), col("__f")) + 1)
          .otherwise(datediff(col("__m"), col("__f")) + 1).as("__t"),
        when(datediff(col("__m"), col("__l")) >= churnGapDays, 1L)
          .otherwise(0L).as("__death"))
    val byT = durations.groupBy("__t")
      .agg(sum(col("__death")).as("n_deaths"),
        sum(lit(1L) - col("__death")).as("n_censored"),
        count(lit(1)).as("__n_at"))
    // distinct-duration plane (days-in-range-bounded): single-partition
    // windows are by-construction bounded here
    val bk = graft.functions.ArrayMath.boundedKey(byT)
    val wOrd = W.partitionBy(bk).orderBy(col("__t"))
    val wPrefix = wOrd.rowsBetween(W.unboundedPreceding, 0)
    val wBefore = wOrd.rowsBetween(W.unboundedPreceding, -1)
    byT
      .withColumn("n_risk",
        sum(col("__n_at")).over(W.partitionBy(bk)) -
          coalesce(sum(col("__n_at")).over(wBefore), lit(0L)))
      .withColumn("__term",
        when(col("n_deaths") < col("n_risk"),
          log(lit(1.0) - col("n_deaths").cast("double") /
            col("n_risk").cast("double")).cast("decimal(18,12)")))
      .withColumn("__dead_all",
        max(when(col("n_deaths") >= col("n_risk"), 1).otherwise(0))
          .over(wPrefix))
      .withColumn("__lnsum", sum(col("__term")).over(wPrefix))
      .select(col("__t").cast("long").as("t_days"), col("n_risk"),
        col("n_deaths"), col("n_censored"),
        when(col("__dead_all") === 1, lit(0.0))
          .otherwise(exp(coalesce(col("__lnsum"),
            lit(0).cast("decimal(18,12)")).cast("string").cast("double")))
          .as("survival"))
  }

  /** Rolling `windowDays`-day distinct users per calendar day — the
    * DAU/WAU/MAU family — WITHOUT the day×user explosion: the naive
    * plan range-joins every event against every window it falls in
    * (28× the corpus for MAU at 100 TB) and pays a COUNT DISTINCT per
    * day; this one is linear in (user, day) pairs.
    *
    * Interval-union formulation: an activity day d makes the user
    * active for window-end days [d, d+L−1]. Per user, activity days
    * with gaps ≤ L−1 merge into coverage segments (one lag window over
    * the deduped user-day frame — partitioned by user, so it scales);
    * each segment [s, e] contributes +1 at day s and −1 at day e+L.
    * Summing boundary deltas per day and running-summing over the
    * calendar gives the exact distinct-user count per window — no
    * distinct aggregation ever runs over raw events beyond the initial
    * (user, day) dedup.
    *
    * The final running sum is a partition-less window over the CALENDAR
    * frame (one row per day — thousands of rows at decades of history),
    * which is single-task by construction and deliberately so; every
    * frame before it is user- or day-partitioned.
    *
    * @param tsCol timestamp column; activity is bucketed by its UTC date
    * @return (day DATE, `outCol` BIGINT) for every day in
    *         [min activity day, max activity day] — gap days report 0
    */
  def rollingDistinctUsers(events: DataFrame, userCol: String,
                           tsCol: String, windowDays: Int,
                           outCol: String = "n_active"): DataFrame =
    rollingFromActivity(
      activityDays(events, userCol, tsCol), windowDays, outCol)

  /** Several window lengths over ONE corpus scan — the DAU/WAU/MAU
    * report shape: the deduped (user, day) plane is materialized once
    * (localCheckpoint) and each window length reuses it; the per-L
    * frames join on the shared day spine. 3 windows = 1 scan, not 3.
    *
    * → (day, <name> per requested (windowDays, name))
    */
  def rollingDistinctUsersMulti(events: DataFrame, userCol: String,
                                tsCol: String,
                                windows: Seq[(Int, String)]): DataFrame = {
    require(windows.nonEmpty, "need at least one window")
    require(windows.map(_._2).distinct.size == windows.size,
      "output column names must be distinct")
    val act = activityDays(events, userCol, tsCol).localCheckpoint()
    windows.map { case (l, name) => rollingFromActivity(act, l, name) }
      .reduce(_.join(_, "day"))
  }

  private def activityDays(events: DataFrame, userCol: String,
                           tsCol: String): DataFrame =
    events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .filter(col("__u").isNotNull && col("__d").isNotNull)
      .distinct()

  private def rollingFromActivity(act: DataFrame, windowDays: Int,
                                  outCol: String): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__d"))
    val seg = act
      .withColumn("__gap", datediff(col("__d"), lag(col("__d"), 1).over(w)))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > windowDays - 1, 1L)
          .otherwise(0L))
      .withColumn("__seg", sum(col("__new")).over(w))
      .groupBy(col("__u"), col("__seg"))
      .agg(min(col("__d")).as("__s"), max(col("__d")).as("__e"))
    val deltas = seg.select(col("__s").as("day"), lit(1L).as("__delta"))
      .unionByName(seg.select(date_add(col("__e"), windowDays).as("day"),
        lit(-1L).as("__delta")))
      .groupBy("day").agg(sum(col("__delta")).as("__delta"))
    val spine = act.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    // calendar-day plane (days-in-range-bounded): the single-partition
    // cumsum is by-construction bounded
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(spine))
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.select(col("day"), lit(0L).as("__delta"))
      .unionByName(deltas)
      .groupBy("day").agg(sum(col("__delta")).as("__delta"))
      .withColumn(outCol, sum(col("__delta")).over(wd))
      .join(spine, Seq("day")) // clip boundary days past the last activity
      .select(col("day"), col(outCol))
  }

  /** Classical additive seasonal decomposition of the daily event-count
    * series (the moving-average method behind STL's outer loop;
    * Macaulay 1931, Cleveland et al. 1990 §1): value = trend + seasonal
    * + remainder, with trend the centered `period`-day moving average,
    * seasonal the per-period-position mean of the detrended series, and
    * remainder the leftover — the standard "is Sunday low or is usage
    * dropping?" disentangling pass before trend/anomaly readouts
    * ([[dailyTrend]], [[cusumChangePoint]]) on weekly-cyclic products.
    *
    * Exactness: daily counts are integers on the zero-filled day spine;
    * the trend window sum S_t stays an exact integer, so trend = S_t/p,
    * seasonal_k = Σ(p·v_t − S_t)/(p·cnt_k) are each ONE IEEE division
    * of exact integers, and remainder = (v − trend) − seasonal is the
    * same fixed left-associated IEEE sequence in any engine. No float
    * ever accumulates. The seasonal means are raw (uncentered) —
    * remainder is by construction the EXACT leftover in that
    * association order (recomposing trend+seasonal+remainder re-rounds
    * and agrees to IEEE rounding error; the decomposition itself is
    * bit-deterministic, which is what the oracle hash certifies).
    * Period positions are epoch-day mod p (p=7 ⇒ a fixed weekday
    * mapping) in the NON-NEGATIVE `pmod` convention — an oracle must
    * spell it ((x % p) + p) % p so pre-1970 days (negative epoch-day)
    * land on the same position in both engines.
    *
    * Trend (hence seasonal/remainder) is NULL on the (p−1)/2 edge days
    * where the centered window is incomplete — classical decomposition
    * does not extrapolate.
    *
    * Scale shape: one aggregation to the day plane; the windows run on
    * the calendar spine (days-in-range-bounded, [[rollingDistinctUsers]]
    * discipline) and the seasonal means on the p-row position plane.
    *
    * → (day, pos, value, trend, seasonal, remainder), one row per
    *   spine day, ordered by day.
    */
  def seasonalDecompose(events: DataFrame, tsCol: String,
                        period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1 && period <= 400,
      s"period must be odd and in [3,400], got $period")
    val h = (period - 1) / 2
    val daily = events
      .select(to_date(col(tsCol)).as("day"))
      .filter(col("day").isNotNull)
      .groupBy("day").agg(count(lit(1)).as("__n"))
    val spine = daily
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val z = spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("__x"),
        coalesce(col("__n"), lit(0L)).as("value"))
    // calendar-day plane: single-partition window bounded by days-in-range
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(z))
      .orderBy(col("__x")).rangeBetween(-h, h)
    val t = z
      .withColumn("__s", sum(col("value")).over(wd))
      .withColumn("__w", count(lit(1)).over(wd))
      .withColumn("pos", pmod(col("__x"), lit(period.toLong)))
      // p·v − S: the detrended value as an exact integer numerator over p
      .withColumn("__dnum",
        when(col("__w") === period,
          col("value") * period - col("__s")))
    val seas = t.filter(col("__dnum").isNotNull)
      .groupBy("pos")
      .agg(sum(col("__dnum")).as("__snum"), count(lit(1)).as("__scnt"))
      .withColumn("seasonal",
        col("__snum").cast("double") /
          (col("__scnt").cast("double") * lit(period.toDouble)))
      .select(col("pos"), col("seasonal"))
    t.join(broadcast(seas), Seq("pos"), "left") // p-row position plane
      .withColumn("trend",
        when(col("__w") === period,
          col("__s").cast("double") / lit(period.toDouble)))
      .select(col("day"), col("pos"), col("value"),
        col("trend"),
        when(col("trend").isNotNull, col("seasonal")).as("seasonal"),
        when(col("trend").isNotNull,
          (col("value").cast("double") - col("trend")) - col("seasonal"))
          .as("remainder"))
      .orderBy("day")
  }

  /** Difference-in-differences readout (Card & Krueger 1994 practice;
    * the pre-period-controlled sibling of [[abTestReport]]): per-user
    * `metricType` event counts split at `cutoverUs` into pre/post,
    * arms from the same deterministic md5 user bucketing, effect =
    * (T̄_post − T̄_pre) − (C̄_post − C̄_pre) — the pre-period
    * difference nets out persistent arm imbalance that a raw post
    * comparison misreads as treatment effect.
    *
    * The user panel is fixed per arm (every user with ANY event counts
    * in both period means — the balanced-panel convention), so the
    * four means share denominators and the estimate is a fixed
    * sequence of IEEE divisions of exact integer sums, engine-
    * identical. Means are NULL (not NaN) for an empty arm.
    *
    * Scale shape: one aggregation to the user plane (map-side
    * combined), one 1-row reduction. Output is one row.
    *
    * → (n_control, n_treatment, mean_pre_control, mean_post_control,
    *   mean_pre_treatment, mean_post_treatment, did_effect)
    */
  def diffInDiff(events: DataFrame, userCol: String, typeCol: String,
                 usCol: String, metricType: String,
                 cutoverUs: Long): DataFrame = {
    val perUser = events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(usCol).cast("long").as("__us"))
      .filter(col("__u").isNotNull && col("__us").isNotNull)
      .groupBy("__u")
      .agg(
        sum(when(col("__t") === metricType && col("__us") < cutoverUs, 1L)
          .otherwise(0L)).as("__pre"),
        sum(when(col("__t") === metricType && col("__us") >= cutoverUs, 1L)
          .otherwise(0L)).as("__post"))
      .select(Curation.hashBucket(col("__u"), 2).as("__arm"),
        col("__pre"), col("__post"))
    val s = perUser.agg(
      coalesce(sum(when(col("__arm") === 0, 1L)), lit(0L)).as("n_control"),
      coalesce(sum(when(col("__arm") === 0, col("__pre"))), lit(0L))
        .as("__pc"),
      coalesce(sum(when(col("__arm") === 0, col("__post"))), lit(0L))
        .as("__qc"),
      coalesce(sum(when(col("__arm") === 1, 1L)), lit(0L))
        .as("n_treatment"),
      coalesce(sum(when(col("__arm") === 1, col("__pre"))), lit(0L))
        .as("__pt"),
      coalesce(sum(when(col("__arm") === 1, col("__post"))), lit(0L))
        .as("__qt"))
    val nc = col("n_control").cast("double")
    val nt = col("n_treatment").cast("double")
    val mpc = col("__pc").cast("double") / nc
    val mqc = col("__qc").cast("double") / nc
    val mpt = col("__pt").cast("double") / nt
    val mqt = col("__qt").cast("double") / nt
    s.select(col("n_control"), col("n_treatment"),
      when(col("n_control") > 0, mpc).as("mean_pre_control"),
      when(col("n_control") > 0, mqc).as("mean_post_control"),
      when(col("n_treatment") > 0, mpt).as("mean_pre_treatment"),
      when(col("n_treatment") > 0, mqt).as("mean_post_treatment"),
      when(col("n_control") > 0 && col("n_treatment") > 0,
        (mqt - mpt) - (mqc - mpc)).as("did_effect"))
  }

  /** CUPED-adjusted A/B readout (Deng, Xu, Kohavi & Walker, WSDM'13 —
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): the variance-reduction sibling of
    * [[diffInDiff]] on the same panel. Per-user pre-cutover count X
    * (the covariate) and post-cutover count Y, md5 arms; the adjusted
    * metric is Ŷ_u = Y_u − θ·(X_u − X̄) with θ = Cov(X,Y)/Var(X)
    * fitted on the POOLED panel (arm-independent under randomization,
    * so the adjustment is unbiased), and the effect is the difference
    * of adjusted arm means. Variance shrinks by the factor ρ²(X,Y) —
    * reported so the caller can see what the covariate bought.
    *
    * Determinism: the five pooled moments and four arm sums are exact
    * DECIMAL(38,0) integer sums; θ, the adjusted means, and ρ² are one
    * fixed IEEE sequence over their bridged doubles. A constant
    * covariate (Var X = 0) degrades gracefully: θ = 0, the readout
    * falls back to the raw difference of means, var_reduction 0.
    * Empty-arm means are NULL, never NaN.
    *
    * Scale shape: one aggregation to the user plane (map-side
    * combined), one 1-row reduction. Output is one row.
    *
    * → (n_control, n_treatment, theta, var_reduction, effect_raw,
    *   effect_cuped)
    */
  def cupedAb(events: DataFrame, userCol: String, typeCol: String,
              usCol: String, metricType: String,
              cutoverUs: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val perUser = events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(usCol).cast("long").as("__us"))
      .filter(col("__u").isNotNull && col("__us").isNotNull)
      .groupBy("__u")
      .agg(
        sum(when(col("__t") === metricType && col("__us") < cutoverUs, 1L)
          .otherwise(0L)).as("__x"),
        sum(when(col("__t") === metricType && col("__us") >= cutoverUs, 1L)
          .otherwise(0L)).as("__y"))
      .select(Curation.hashBucket(col("__u"), 2).as("__arm"),
        col("__x"), col("__y"))
    val s = perUser.agg(
      count(lit(1)).as("__n"),
      coalesce(sum(col("__x").cast(d38)), lit(0).cast(d38)).as("__sx"),
      coalesce(sum(col("__y").cast(d38)), lit(0).cast(d38)).as("__sy"),
      coalesce(sum(col("__x").cast(d38) * col("__y")), lit(0).cast(d38))
        .as("__sxy"),
      coalesce(sum(col("__x").cast(d38) * col("__x")), lit(0).cast(d38))
        .as("__sxx"),
      coalesce(sum(col("__y").cast(d38) * col("__y")), lit(0).cast(d38))
        .as("__syy"),
      coalesce(sum(when(col("__arm") === 0, 1L)), lit(0L)).as("n_control"),
      coalesce(sum(when(col("__arm") === 0, col("__x").cast(d38))),
        lit(0).cast(d38)).as("__xc"),
      coalesce(sum(when(col("__arm") === 0, col("__y").cast(d38))),
        lit(0).cast(d38)).as("__yc"),
      coalesce(sum(when(col("__arm") === 1, 1L)), lit(0L)).as("n_treatment"),
      coalesce(sum(when(col("__arm") === 1, col("__x").cast(d38))),
        lit(0).cast(d38)).as("__xt"),
      coalesce(sum(when(col("__arm") === 1, col("__y").cast(d38))),
        lit(0).cast(d38)).as("__yt"))
    def d(c: String) = col(c).cast("string").cast("double")
    val nD = col("__n").cast("double")
    val covN = nD * d("__sxy") - d("__sx") * d("__sy") // n²·Cov(X,Y)
    val varXN = nD * d("__sxx") - d("__sx") * d("__sx") // n²·Var(X)
    val varYN = nD * d("__syy") - d("__sy") * d("__sy")
    val theta = when(varXN > 0, covN / varXN).otherwise(lit(0.0))
    val xbar = d("__sx") / nD
    val nc = col("n_control").cast("double")
    val nt = col("n_treatment").cast("double")
    val adjC = d("__yc") / nc - theta * (d("__xc") / nc - xbar)
    val adjT = d("__yt") / nt - theta * (d("__xt") / nt - xbar)
    s.select(col("n_control"), col("n_treatment"),
      when(col("__n") > 0, theta).as("theta"),
      when(col("__n") > 0 && varXN > 0 && varYN > 0,
        (covN * covN) / (varXN * varYN)).otherwise(
        when(col("__n") > 0, lit(0.0))).as("var_reduction"),
      when(col("n_control") > 0 && col("n_treatment") > 0,
        d("__yt") / nt - d("__yc") / nc).as("effect_raw"),
      when(col("n_control") > 0 && col("n_treatment") > 0, adjT - adjC)
        .as("effect_cuped"))
  }

  /** Markov removal-effect attribution (Anderl et al., Int. J. Res.
    * Marketing 2016 — the data-driven alternative to [[attribution]]'s
    * first/last-touch heuristics): model user journeys as a first-order
    * Markov chain over touch types with absorbing CONV/NULL states, and
    * credit each channel by how much the chain's conversion probability
    * drops when that channel is removed (its transitions redirected to
    * NULL): effect_c = 1 − P_removed(c)/P_full, shares normalized over
    * channels.
    *
    * Journey contract: per user, events ordered by (us, tie) up to the
    * FIRST `convType` event (exclusive — the conversion itself is not a
    * touch); users with a conversion end in CONV (START→CONV when no
    * touch precedes it), others end in NULL. Repeat conversions start
    * no second journey.
    *
    * Determinism (the [[graft.ops.WebGraph.pageRank]] discipline):
    * absorption probabilities come from `iterations` fixed rounds of
    * value iteration in SCALE-scaled integer arithmetic — x(s) ←
    * (Σ_s' n(s,s')·x(s')) div n_out(s) with x(CONV)=SCALE, x(NULL)=0 —
    * products through DECIMAL(38,0)/HUGEINT, so every round replays
    * bit-exactly as an unrolled CTE. Effects and shares are single IEEE
    * divisions of the exact scaled integers (effect numerators clamped
    * at 0 — floor-division noise cannot produce a negative credit).
    *
    * Scale shape: one window pass over the (user-partitioned) journey
    * slice builds the transition counts; everything after runs on the
    * (channels+1) × transitions plane — bounded by touch-type
    * cardinality squared (the [[trajectorySurprisal]] bound), never by
    * corpus size. Each round localCheckpoints (O(1) plan depth); no
    * driver collects beyond the sentinel-collision guard scalar.
    *
    * → (channel, p_conv_full, p_conv_removed, removal_effect,
    *   attribution_share), one row per channel; removal_effect NULL
    *   when P_full = 0, share NULL when all effects are 0.
    */
  def markovAttribution(events: DataFrame, userCol: String,
                        typeCol: String, usCol: String, tieCol: String,
                        convType: String, iterations: Int = 12,
                        scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(convType != null && convType.nonEmpty, "convType required")
    val Start = "__start__"; val Conv = "__conv__"
    val Nul = "__null__"; val NoneTag = "__none__"
    val sentinels = Seq(Start, Conv, Nul, NoneTag)
    val ev = events
      .select(col(userCol).cast("string").as("__u"),
        col(typeCol).cast("string").as("__t"),
        col(usCol).cast("long").as("__us"),
        col(tieCol).cast("long").as("__tie"))
      .filter(col("__u").isNotNull && col("__t").isNotNull &&
        col("__us").isNotNull)
    val conv = ev.filter(col("__t") === convType)
      .groupBy("__u")
      .agg(min(struct(col("__us"), col("__tie"))).as("__c"))
    val j = ev.filter(col("__t") =!= convType)
      .join(conv, Seq("__u"), "left")
      .filter(col("__c").isNull ||
        struct(col("__us"), col("__tie")) < col("__c"))
      .localCheckpoint() // journey slice: feeds windows + channel plane
    // sentinel-collision guard: one bounded scalar
    require(j.filter(col("__t").isin(sentinels: _*)).isEmpty,
      s"touch types may not collide with the sentinels $sentinels")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    val seq = j.select(col("__u"), col("__t"), col("__c"),
      row_number().over(wu).as("__rn"),
      lag(col("__t"), 1).over(wu).as("__prev"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__u"))).as("__cnt"))
    val endState = when(col("__c").isNotNull, lit(Conv)).otherwise(lit(Nul))
    val trans = seq.filter(col("__rn") === 1)
      .select(lit(Start).as("src"), col("__t").as("dst"))
      .unionByName(seq.filter(col("__rn") >= 2)
        .select(col("__prev").as("src"), col("__t").as("dst")))
      .unionByName(seq.filter(col("__rn") === col("__cnt"))
        .select(col("__t").as("src"), endState.as("dst")))
      .unionByName(conv // converters with no prior touch: START→CONV
        .join(j.select("__u").distinct(), Seq("__u"), "left_anti")
        .select(lit(Start).as("src"), lit(Conv).as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val nout = trans.groupBy("src").agg(sum(col("n")).as("nout"))
    val channels = j.select(col("__t").as("channel")).distinct()
    // removal dimension: each channel once, plus the intact chain —
    // (channels+1) × transitions rows, type-cardinality-bounded
    val tf = channels.select(col("channel").as("removed"))
      .unionByName(channels.sparkSession.range(1)
        .select(lit(NoneTag).as("removed")))
      .crossJoin(trans)
      .filter(col("src") =!= col("removed") && col("dst") =!= col("removed"))
      .join(nout, "src") // denominators stay the FULL chain's n_out:
      .localCheckpoint() //   mass into the removed channel flows to NULL
    var x = tf.select(col("removed"), col("src").as("state"))
      .distinct().withColumn("v", lit(0L)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val xr = x.select(col("removed").as("__xr"),
        col("state").as("__xs"), col("v"))
      x = tf.join(xr, col("removed") === col("__xr") &&
          col("dst") === col("__xs"), "left")
        .withColumn("__xv",
          when(col("dst") === Conv, lit(scale))
            .when(col("dst") === Nul, lit(0L))
            .otherwise(coalesce(col("v"), lit(0L))))
        .groupBy("removed", "src")
        .agg(sum(col("n").cast("decimal(38,0)") * col("__xv")).as("__num"),
          max(col("nout")).as("__no"))
        .select(col("removed"), col("src").as("state"),
          expr("CAST((__num div __no) AS BIGINT)").as("v"))
        .localCheckpoint() // O(1)-deep plan across rounds
    }
    val ps = x.filter(col("state") === Start)
      .select(col("removed"), col("v"))
    val pFull = ps.filter(col("removed") === NoneTag)
      .select(col("v").as("__pf"))
    val out = channels
      .join(ps.withColumnRenamed("removed", "channel"), Seq("channel"),
        "left")
      .withColumn("__p", coalesce(col("v"), lit(0L)))
      .crossJoin(broadcast(pFull)) // 1-row scalar frame
      .withColumn("__eff", greatest(col("__pf") - col("__p"), lit(0L)))
    // channel plane: single-partition window bounded by type cardinality
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.ArrayMath.boundedKey(out))
    val scaleD = lit(scale.toDouble)
    out.withColumn("__tot", sum(col("__eff")).over(wAll))
      .select(col("channel"),
        (col("__pf").cast("double") / scaleD).as("p_conv_full"),
        (col("__p").cast("double") / scaleD).as("p_conv_removed"),
        when(col("__pf") > 0,
          col("__eff").cast("double") / col("__pf").cast("double"))
          .as("removal_effect"),
        when(col("__tot") > 0,
          col("__eff").cast("double") / col("__tot").cast("double"))
          .as("attribution_share"))
  }
}
