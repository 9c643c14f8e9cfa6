package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Profile}

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type", "us")
  }

  test("funnel: strict order, first occurrences, window bound inclusive at t1+W") {
    val times = EventOps.funnel(ev(
      // u1 converts fully; the SECOND signup (t=5) must not reset t1
      (1L, "a", 10L), (1L, "a", 5L), (1L, "b", 20L), (1L, "c", 30L),
      // u2: b BEFORE a — strict order breaks the chain at step 2
      (2L, "b", 1L), (2L, "a", 2L), (2L, "c", 3L),
      // u3: step2 lands exactly at t1+W (inclusive), step3 at t1+W+1 (out)
      (3L, "a", 0L), (3L, "b", 100L), (3L, "c", 101L)),
      "user_id", "event_type", "us", Seq("a", "b", "c"), windowUs = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(times(1L) == ((5L, 20L, 30L)))
    assert(times(2L) == ((2L, null, null)),
      "u2's b precedes its a, so the chain stalls at step 2 — the later c cannot rescue it")
    assert(times(3L) == ((0L, 100L, null)),
      "t1+W inclusive for step 2; step 3 at 101 is outside the window")
  }

  test("funnelReport: per-step survivors and exact time totals") {
    val times = EventOps.funnel(ev(
      (1L, "a", 0L), (1L, "b", 10L),
      (2L, "a", 0L), (2L, "b", 30L), (2L, "c", 40L)),
      "user_id", "event_type", "us", Seq("a", "b", "c"), windowUs = 1000L)
    val rep = EventOps.funnelReport(times, Seq("a", "b", "c"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq((1L, "a", 2L, 0L), (2L, "b", 2L, 40L),
      (3L, "c", 1L, 40L)))
  }

  test("retentionCohorts: absolute cohort periods, offsets, distinct users") {
    val got = EventOps.retentionCohorts(ev(
      (1L, "x", 100L), (1L, "x", 105L), (1L, "x", 125L),
      (2L, "x", 109L), (2L, "x", 131L),
      (3L, "x", 110L)),
      "user_id", "us", periodUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // u1: first 100 → cohort 10, offsets 0,0,2; u2: first 109 → cohort 10,
    // offsets 0,2; u3: first 110 → cohort 11, offset 0
    assert(got == Set((10L, 0L, 2L), (10L, 2L, 2L), (11L, 0L, 1L)))
  }

  test("psiDrift: identical snapshots score ~0; a shifted snapshot trips the gate; empty bins stay finite") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Profile.psiDrift(base, base, "v", 0.0, 10.0, 10).head()
    assert(same.getLong(0) == 1000L && same.getLong(1) == 1000L)
    assert(math.abs(same.getDouble(2)) < 1e-9 && !same.getBoolean(3))
    // all mass moves to the top decile — bins 0..8 empty on one side
    val shifted = (1 to 1000).map(i => 95.0 + (i % 5)).toDF("v")
    val drift = Profile.psiDrift(base, shifted, "v", 0.0, 10.0, 10).head()
    assert(drift.getBoolean(3) && drift.getDouble(2) > 1.0)
  }

  test("lifecycleStates: all four states on a hand trajectory") {
    import spark.implicits._
    // period length 10us. u1: periods 0,1,3 → new@0, active@1, dormant@2,
    // resurrected@3, dormant@4 (horizon = 4, set by u2's last activity).
    // u2: periods 2,4 → new@2, dormant@3, resurrected@4.
    val ev = Seq((1L, 5L), (1L, 12L), (1L, 35L), (2L, 25L), (2L, 48L))
      .toDF("user_id", "us")
    val got = graft.ops.EventOps.lifecycleStates(ev, "user_id", "us", 10L)
      .orderBy("period", "state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "new", 1L), (1L, "active", 1L), (2L, "dormant", 1L),
      (2L, "new", 1L), (3L, "dormant", 1L), (3L, "resurrected", 1L),
      (4L, "dormant", 1L), (4L, "resurrected", 1L)),
      s"got ${got.toSeq}")
  }

  test("attribution: first/last touch windows, lookback cut, unattributed NULLs") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 10L, 1L), (1L, "view", 20L, 2L),
      (1L, "purchase", 30L, 3L),      // first=click@10, last=view@20
      (1L, "purchase", 200L, 4L),     // all touches outside lookback=50
      (2L, "view", 5L, 5L), (2L, "purchase", 5L, 6L),
      (2L, "click", 5L, 7L))          // same us: tie 5<6 counts, 7 doesn't
      .toDF("user_id", "t", "us", "eid")
    val got = graft.ops.EventOps.attribution(ev, "user_id", "t", "us",
        "eid", Seq("click", "view"), "purchase", lookbackUs = 50L)
      .orderBy("user_id", "conv_us").collect()
    assert(got(0).getString(3) == "click" && got(0).getLong(4) == 10L &&
      got(0).getString(5) == "view" && got(0).getLong(6) == 20L)
    assert(got(1).isNullAt(3) && got(1).isNullAt(5),
      "out-of-lookback touches must leave the conversion unattributed")
    assert(got(2).getString(3) == "view" && got(2).getString(5) == "view",
      "same-instant touch counts only when its tiebreak precedes")
  }

  test("unorderedFunnel: order-free within window, anchored at first entry step") {
    import spark.implicits._
    val ev = Seq(
      (1L, "purchase", 5L), (1L, "signup", 10L), (1L, "purchase", 12L),
      (1L, "view", 20L),     // purchase BEFORE t1 ignored; in-window both
      (2L, "signup", 10L), (2L, "view", 200L)) // view outside window=50
      .toDF("user_id", "t", "us")
    val got = graft.ops.EventOps.unorderedFunnel(ev, "user_id", "t", "us",
        Seq("signup", "view", "purchase"), windowUs = 50L)
      .orderBy("user_id").collect()
    assert(got(0).getLong(1) == 10L && got(0).getLong(2) == 20L &&
      got(0).getLong(3) == 12L && got(0).getBoolean(4),
      "steps may complete in any order inside the window")
    assert(got(1).getLong(1) == 10L && got(1).isNullAt(2) &&
      !got(1).getBoolean(4))
  }

  test("trajectorySurprisal: the off-pattern journey scores the highest NLL") {
    import spark.implicits._
    // u1/u2 walk the common a->b->a->b path; u3 takes the rare a->x
    val ev = Seq(
      (1L, "a", 0L, 1L), (1L, "b", 1L, 2L), (1L, "a", 2L, 3L),
      (1L, "b", 3L, 4L),
      (2L, "a", 0L, 5L), (2L, "b", 1L, 6L), (2L, "a", 2L, 7L),
      (2L, "b", 3L, 8L),
      (3L, "a", 0L, 9L), (3L, "x", 1L, 10L))
      .toDF("user_id", "t", "us", "eid")
    val got = graft.ops.EventOps.trajectorySurprisal(
        ev, "user_id", "t", "us", "eid")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // model: P(b|a)=4/5, P(a|b)=1, P(x|a)=1/5
    val common = -(2 * math.log(0.8) + math.log(1.0)) / 3
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - common) < 1e-9)
    assert(math.abs(got(3L)._2 - (-math.log(0.2))) < 1e-9)
    assert(got(3L)._2 > got(1L)._2 * 5,
      s"the rare path must stand out: ${got(3L)._2} vs ${got(1L)._2}")
  }

  test("dailyTrend: exact slope on a planted ramp; perfect fit reports NULL t") {
    import spark.implicits._
    // 'up': day d has d+1 events (slope exactly 1, zero residual)
    // 'noisy': 5,7,5,7,... around a flat mean (slope ~0, not trending)
    val rows = (0 until 10).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d 01:00:00"
      Seq.fill(d + 1)(("up", day)) ++
        Seq.fill(if (d % 2 == 0) 5 else 7)(("noisy", day))
    }
    val got = graft.ops.EventOps.dailyTrend(
        rows.toDF("event_type", "s")
          .select(col("event_type"), to_timestamp(col("s")).as("ts")),
        "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    val up = got("up")
    assert(up.getLong(1) == 10L && math.abs(up.getDouble(2) - 1.0) < 1e-9)
    assert(up.isNullAt(4) && up.isNullAt(5),
      "a zero-residual fit has no finite t statistic")
    val noisy = got("noisy")
    assert(math.abs(noisy.getDouble(2)) < 0.2, s"slope ${noisy.getDouble(2)}")
    assert(!noisy.getBoolean(5), "oscillation must not flag as trending")
  }

  test("rfmSegments: monotone users land in strictly ordered quintiles") {
    import spark.implicits._
    // user i: i events of value 100 each, last at i*10 us -> recency,
    // frequency and monetary all rank users 1..5 in the same order
    val ev = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, 100.0, (j * 10).toLong))
    }.toDF("user_id", "value", "us")
    val got = graft.ops.EventOps.rfmSegments(ev, "user_id", "value", "us",
        nBuckets = 5, numPartitions = 3)
      .orderBy("user_id").collect()
    // user 5 is most recent, most frequent, highest total -> 555
    assert(got(4).getLong(7) == 555L, s"u5 ${got(4)}")
    assert(got(0).getLong(7) == 111L, s"u1 ${got(0)}")
    // scores are permutations of 1..5 per dimension (5 users, 5 buckets)
    Seq(4, 5, 6).foreach { c =>
      assert(got.map(_.getLong(c)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"column $c must be a 1..5 permutation")
    }
  }

  test("hourOfWeekProfile: ISO weekday cells, zero-filled grid, concentration rejects") {
    import spark.implicits._
    // 2024-01-01 is a Monday; 2024-01-07 a Sunday
    val ev = Seq(("a", "2024-01-01 10:15:00"), ("a", "2024-01-01 10:45:00"),
      ("a", "2024-01-01 10:59:59"), ("a", "2024-01-07 23:00:00"))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val got = graft.ops.EventOps.hourOfWeekProfile(ev, "event_type", "ts")
      .collect()
    assert(got.length == 168, "every (weekday, hour) cell is reported")
    val byCell = got.map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(byCell((1L, 10L)) == 3L && byCell((7L, 23L)) == 1L)
    assert(byCell.values.sum == 4L)
    assert(got.head.getBoolean(6),
      s"4 events in 2 cells is maximally non-uniform: chi2=${got.head.getDouble(5)}")
  }

  test("leadLagCorrelation: a planted 2-day lead peaks at exactly r=1") {
    import spark.implicits._
    // 'a' fires n(d) times on day d; 'b' fires n(d) times on day d+2
    val rows = (1 to 10).flatMap { day =>
      val n = day % 3 + 1
      Seq.fill(n)(("a", f"2024-01-$day%02d 01:00:00")) ++
        Seq.fill(n)(("b", f"2024-01-${day + 2}%02d 01:00:00"))
    }
    val ev = rows.toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val got = graft.ops.EventOps.leadLagCorrelation(
        ev, "event_type", "a", "b", "ts", maxLag = 3)
      .orderBy("lag").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got(2L) > 1.0 - 1e-12,
      s"the planted lead must correlate at ~1 (sqrt·sqrt ulp): $got")
    assert(got.filterNot(_._1 == 2L).values.forall(_ < 0.999),
      s"other lags must not reach 1: $got")
  }

  test("cusumChangePoint: the planted level shift is localized at its boundary") {
    import spark.implicits._
    // mean 1.0 for Jan 1-10, mean 5.0 for Jan 11-20: |CUSUM| peaks Jan 10
    val rows = (1 to 20).flatMap { d =>
      val v = if (d <= 10) 1.0 else 5.0
      Seq(("x", v, f"2024-01-$d%02d 01:00:00"), ("x", v, f"2024-01-$d%02d 02:00:00"))
    }
    val got = graft.ops.EventOps.cusumChangePoint(
        rows.toDF("event_type", "value", "s")
          .select(col("event_type"), col("value"),
            to_timestamp(col("s")).as("ts")),
        "event_type", "value", "ts")
      .orderBy("day").collect()
    val cp = got.filter(_.getBoolean(4))
    assert(cp.length == 1 && cp.head.getDate(1).toString == "2024-01-10",
      s"change point must sit at the shift boundary: ${cp.toSeq}")
    assert(math.abs(cp.head.getDouble(3) + 20.0) < 1e-9,
      s"CUSUM at the boundary must be -20: ${cp.head.getDouble(3)}")
    assert(math.abs(got.last.getDouble(3)) < 1e-9,
      "CUSUM returns to ~0 at the series end")
  }

  test("trigramMotifs: consecutive triples with tiebreak; shares per first step") {
    import spark.implicits._
    val ev = Seq((1L, "a", 10L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L),
      (1L, "d", 30L, 4L), (2L, "a", 0L, 5L), (2L, "b", 1L, 6L),
      (2L, "x", 2L, 7L))
      .toDF("user_id", "t", "us", "eid")
    val got = graft.ops.EventOps.trigramMotifs(ev, "user_id", "t", "us", "eid")
      .orderBy("t0", "t1", "t2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("a", "b", "c", 1L, 0.5), ("a", "b", "x", 1L, 0.5),
      ("b", "c", "d", 1L, 1.0)),
      s"same-instant a/b must order by the tiebreak: ${got.toSeq}")
  }

  test("itemCooccurrence: degree cap excludes the celebrity; jaccard from capped pops") {
    import spark.implicits._
    val ui = (Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L)) ++
      (1L to 10L).map(i => (3L, i))) // celebrity: 10 items, cap is 5
      .toDF("user_id", "item")
    val got = graft.ops.EventOps.itemCooccurrence(ui, "user_id", "item",
        maxUserDegree = 5, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set((1L, 2L)),
      s"only (1,2) reaches support 2 without the celebrity: ${got.keySet}")
    assert(got((1L, 2L)) == ((2L, 1.0)),
      "jaccard = 2/(2+2-2) over capped popularities")
    // raising the cap readmits the celebrity: (1,2) support becomes 3
    val wide = graft.ops.EventOps.itemCooccurrence(ui, "user_id", "item",
        maxUserDegree = 10, minSupport = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wide((1L, 2L)) == 3L)
  }

  test("associationRules: hand values, asymmetric confidence, symmetric lift") {
    import spark.implicits._
    val ui = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (4L, 2L), (5L, 2L)).toDF("user_id", "item")
    val got = graft.ops.EventOps.associationRules(ui, "user_id", "item",
        maxUserDegree = 10, minSupport = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // N=5, pop(1)=3, pop(2)=4, n(1,2)=2
    val r12 = got((1L, 2L))
    val r21 = got((2L, 1L))
    assert(r12._1 == 2L && r12._2 == 0.4)
    assert(math.abs(r12._3 - 2.0 / 3) < 1e-12 && r21._3 == 0.5,
      s"confidence is directional: $r12 / $r21")
    assert(math.abs(r12._4 - r21._4) < 1e-12 &&
      math.abs(r12._4 - (2.0 / 3) / (4.0 / 5)) < 1e-12,
      s"lift is symmetric: ${r12._4} vs ${r21._4}")
  }

  test("abTestReport: counts partition by the hash arms; z matches the pooled formula") {
    import spark.implicits._
    // users 1..40; a user converts iff id % 3 == 0 (uncorrelated with md5 arm)
    val ev = (1L to 40L).flatMap { u =>
      Seq((u, "view")) ++ (if (u % 3 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val r = graft.ops.EventOps.abTestReport(ev, "user_id", "event_type",
      "purchase").head()
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(3),
      r.getLong(4))
    assert(na + nb == 40L && ca + cb == 13L)
    // arms replicate the hashBucket assignment exactly
    val arms = (1L to 40L).toDF("u")
      .select(col("u"), graft.ops.Curation.hashBucket(col("u"), 2).as("arm"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(na == arms.values.count(_ == 0L) && nb == arms.values.count(_ == 1L))
    assert(ca == (1L to 40L).count(u => u % 3 == 0 && arms(u) == 0L))
    // z recomputed from the four integers
    val (raD, rbD) = (ca.toDouble / na, cb.toDouble / nb)
    val pooled = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pooled * (1 - pooled) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(7) - (raD - rbD) / se) < 1e-12)
    assert(r.getBoolean(8) == (math.abs((raD - rbD) / se) > 1.96))
  }

  test("sessionize/sessionStats: hand-computed gap cuts; boundary gap starts a new session") {
    import spark.implicits._
    // gap = 100us. u1: events at 0, 50, 149 (gap 99 merges), 249 (gap 100
    // cuts), 260. u2: single event. NULL user excluded.
    val ev = Seq((Some(1L), 0L, 1L, 1.5), (Some(1L), 50L, 2L, 2.5),
      (Some(1L), 149L, 3L, 1.0), (Some(1L), 249L, 4L, 4.0),
      (Some(1L), 260L, 5L, 0.25), (Some(2L), 7L, 6L, 3.0),
      (Option.empty[Long], 9L, 7L, 9.0))
      .toDF("user_id", "us", "event_id", "value")
    val seqs = graft.ops.EventOps.sessionize(ev, "user_id", "us",
        "event_id", gapUs = 100L)
      .orderBy("user_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(seqs.toSeq == Seq((1L, 0L, 1L), (1L, 50L, 1L), (1L, 149L, 1L),
      (1L, 249L, 2L), (1L, 260L, 2L), (2L, 7L, 1L)), seqs.toSeq.toString)
    val stats = graft.ops.EventOps.sessionStats(ev, "user_id", "us",
        "event_id", "value", gapUs = 100L)
      .orderBy("user_id", "session_seq").collect()
    assert(stats.length == 3)
    // u1 session 1: [0,149], 3 events, sum 5.0
    assert(stats(0).getLong(2) == 0L && stats(0).getLong(3) == 149L &&
      stats(0).getLong(4) == 149L && stats(0).getLong(5) == 3L &&
      stats(0).getDouble(6) == 5.0)
    // u1 session 2: [249,260], 2 events, sum 4.25
    assert(stats(1).getLong(2) == 249L && stats(1).getLong(5) == 2L &&
      stats(1).getDouble(6) == 4.25)
    // u2: singleton session, duration 0
    assert(stats(2).getLong(0) == 2L && stats(2).getLong(4) == 0L &&
      stats(2).getLong(5) == 1L)
  }

  test("abTestReport: an empty arm reports NULL rates, not NaN") {
    import spark.implicits._
    // one single user -> exactly one arm populated, the other empty
    val ev = Seq((7L, "view"), (7L, "purchase")).toDF("user_id", "event_type")
    val r = graft.ops.EventOps.abTestReport(ev, "user_id", "event_type",
      "purchase").head()
    val (na, nb) = (r.getLong(0), r.getLong(3))
    assert(na + nb == 1L && (na == 0L || nb == 0L))
    val (emptyRateIdx, fullRateIdx) = if (na == 0L) (2, 5) else (5, 2)
    assert(r.isNullAt(emptyRateIdx),
      s"empty arm must report NULL rate, got $r")
    assert(r.getDouble(fullRateIdx) == 1.0)
    assert(r.isNullAt(6) && r.isNullAt(7), "lift/z NULL with an empty arm")
  }

  test("ewmaSmooth: adjusted-EWMA hand values; NULL drops from both sides") {
    import spark.implicits._
    val ev = Seq((1L, Some(1.0), 0L, 1L), (1L, Some(2.0), 10L, 2L),
      (1L, Some(4.0), 20L, 3L),
      (2L, Some(1.0), 0L, 4L), (2L, None, 10L, 5L), (2L, Some(4.0), 20L, 6L))
      .toDF("user_id", "value", "us", "event_id")
    val got = graft.ops.EventOps.ewmaSmooth(ev, "user_id", "value", "us",
        "event_id")
      .orderBy("user_id", "us").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    // u1: y0=1, y1=(2+0.75)/1.75, y2=(4+1.5+0.5625)/2.3125
    assert(got(0)._2 == 1.0)
    assert(math.abs(got(1)._2 - 2.75 / 1.75) < 1e-9)
    assert(math.abs(got(2)._2 - 6.0625 / 2.3125) < 1e-9)
    // u2: NULL at t=10 -> that event's ewma uses only v(t=0); at t=20 the
    // NULL lag is absent from numerator AND denominator
    assert(got(3)._2 == 1.0)
    assert(got(4)._2 == 1.0, "NULL current value smooths over prior values")
    assert(math.abs(got(5)._2 - 4.5625 / 1.5625) < 1e-9)
  }

  test("kaplanMeier: hand curve with censoring; exact zero when the last at-risk dies") {
    import spark.implicits._
    def ev(rows: (Long, String)*) = rows.toSeq.toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    // M = 2024-01-25. u1 dies t=2, u3 dies t=3, u4 censored t=6, u2 censored t=25
    val got = graft.ops.EventOps.kaplanMeier(ev(
        (1L, "2024-01-01 01:00:00"), (1L, "2024-01-02 01:00:00"),
        (2L, "2024-01-01 09:00:00"), (2L, "2024-01-20 01:00:00"),
        (3L, "2024-01-10 01:00:00"), (3L, "2024-01-12 01:00:00"),
        (4L, "2024-01-20 02:00:00"), (4L, "2024-01-25 01:00:00")),
        "user_id", "ts", churnGapDays = 7)
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      Seq((2L, 4L, 1L, 0L), (3L, 3L, 1L, 0L), (6L, 2L, 0L, 1L),
        (25L, 1L, 0L, 1L)), s"frame ${got.toSeq}")
    assert(math.abs(got(0)._5 - 0.75) < 1e-12)
    assert(math.abs(got(1)._5 - 0.5) < 1e-12)
    assert(math.abs(got(2)._5 - 0.5) < 1e-12, "censor rows keep the curve flat")
    assert(math.abs(got(3)._5 - 0.5) < 1e-12)
    // last at-risk user dies -> exact 0.0, not exp(ln(0))
    val zero = graft.ops.EventOps.kaplanMeier(ev(
        (1L, "2024-01-01 01:00:00"), (1L, "2024-01-06 01:00:00"),
        (2L, "2024-01-19 01:00:00"), (2L, "2024-01-20 01:00:00")),
        "user_id", "ts", churnGapDays = 7)
      .orderBy("t_days").collect()
    assert(zero.last.getLong(0) == 6L && zero.last.getDouble(4) == 0.0)
  }

  test("cadenceProfile: constant-gap bot flags, bursty human passes, degenerates handled") {
    import spark.implicits._
    val ev = (
      // bot: metronome every 100us
      (0L to 500L by 100L).map(us => (1L, us)) ++
      // human: bursty
      Seq(0L, 50L, 500L, 510L, 2000L, 2100L).map(us => (2L, us)) ++
      // single event: no gaps, drops out
      Seq((3L, 42L)) ++
      // all same instant: mean gap 0 -> cv NULL
      Seq((4L, 7L), (4L, 7L), (4L, 7L))
    ).zipWithIndex.map { case ((u, us), i) => (u, us, i.toLong) }
      .toDF("user_id", "us", "eid")
    val got = graft.ops.EventOps.cadenceProfile(ev, "user_id", "us", "eid")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L), "single-event user has no gaps")
    assert(got(1L).getLong(1) == 5L && got(1L).getDouble(3) == 0.0 &&
      got(1L).getBoolean(4), "metronome cadence must flag as regular")
    assert(!got(2L).getBoolean(4) && got(2L).getDouble(3) > 0.5,
      s"bursty human must not flag: cv=${got(2L).getDouble(3)}")
    assert(got(4L).isNullAt(3) && got(4L).isNullAt(4),
      "zero mean gap reports NULL cv")
  }

  test("rollingDistinctUsers: interval-union equals the naive window count") {
    import spark.implicits._
    // u1 active Jan 1,2,10 (gap splits the 7-day coverage); u2 active Jan 5
    val ev = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 03:00:00"),
      (1L, "2024-01-02 17:00:00"), (1L, "2024-01-10 00:00:00"),
      (2L, "2024-01-05 23:59:59"))
      .toDF("user_id", "s").select(col("user_id"),
        to_timestamp(col("s")).as("ts"))
    val got = graft.ops.EventOps.rollingDistinctUsers(
        ev, "user_id", "ts", windowDays = 7)
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    val exp = Seq(
      "2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-03" -> 1L,
      "2024-01-04" -> 1L, "2024-01-05" -> 2L, "2024-01-06" -> 2L,
      "2024-01-07" -> 2L, "2024-01-08" -> 2L, "2024-01-09" -> 1L,
      "2024-01-10" -> 2L)
    assert(got.toSeq == exp, s"got ${got.toSeq}")
    // L=1 degenerates to plain DAU with zero-filled gap days
    val dau = graft.ops.EventOps.rollingDistinctUsers(
        ev, "user_id", "ts", windowDays = 1)
      .orderBy("day").collect().map(_.getLong(1)).toSeq
    assert(dau == Seq(1L, 1L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 1L), s"dau $dau")
  }

  test("timeWeightedAvg: NULL measurements extend the prior segment, not deflate it") {
    import spark.implicits._
    val ev = Seq(
      // u1: v=1 holds [0,20) across the NULL at t=10, v=3 holds [20,30)
      (1L, Some(1.0), 0L, 1L), (1L, None, 10L, 2L),
      (1L, Some(3.0), 20L, 3L), (1L, Some(9.0), 30L, 4L),
      // u2: only one non-NULL event -> NULL twa, span 0
      (2L, Some(5.0), 0L, 5L), (2L, None, 50L, 6L))
      .toDF("user_id", "value", "us", "event_id")
    val got = graft.ops.EventOps.timeWeightedAvg(
        ev, "user_id", "value", "us", "event_id")
      .orderBy("user_id").collect()
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 30L)
    assert(math.abs(got(0).getDouble(3) - 50.0 / 30.0) < 1e-9,
      s"NULL at t=10 must not open a zero-value segment: ${got(0)}")
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 0L &&
      got(1).isNullAt(3))
  }

  test("transitions: tiebreak orders same-instant events deterministically") {
    import spark.implicits._
    val ev = Seq((1L, "a", 10L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L))
      .toDF("user_id", "t", "us", "eid")
    val got = graft.ops.EventOps.transitions(ev, "user_id", "t", "us", "eid")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "b", 1L, 1.0), ("b", "c", 1L, 1.0)),
      s"same-us events must order by the tiebreak: ${got.toSeq}")
  }

  test("diffInDiff: matches a Scala reference over the same hash arms; empty-arm NULLs") {
    import spark.implicits._
    // per user u: u%3 pre purchases, u%4 post purchases, plus one noise
    // event so every user is in the panel
    val rows = (1 to 12).flatMap { u =>
      Seq((u.toLong, "view", 50L)) ++
        (0 until u % 3).map(i => (u.toLong, "buy", 100L + i)) ++
        (0 until u % 4).map(i => (u.toLong, "buy", 1000L + i))
    }
    val got = graft.ops.EventOps.diffInDiff(
      rows.toDF("u", "t", "us"), "u", "t", "us", "buy", cutoverUs = 500L)
      .head()
    // reference: same arms via Curation.hashBucket, same IEEE order
    val arms = (1 to 12).map(_.toLong).toDF("u")
      .select(col("u"), graft.ops.Curation.hashBucket(col("u"), 2).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def stats(arm: Long) = {
      val us = (1 to 12).map(_.toLong).filter(arms(_) == arm)
      (us.size.toLong, us.map(_ % 3).sum, us.map(_ % 4).sum)
    }
    val (ncL, pc, qc) = stats(0); val (ntL, pt, qt) = stats(1)
    assert(got.getLong(0) == ncL && got.getLong(1) == ntL)
    val mpc = pc.toDouble / ncL.toDouble; val mqc = qc.toDouble / ncL.toDouble
    val mpt = pt.toDouble / ntL.toDouble; val mqt = qt.toDouble / ntL.toDouble
    assert(got.getDouble(2) == mpc && got.getDouble(3) == mqc)
    assert(got.getDouble(4) == mpt && got.getDouble(5) == mqt)
    assert(got.getDouble(6) == (mqt - mpt) - (mqc - mpc))
    // an input with a single arm reports NULL means for the missing one
    val oneArm = rows.filter { case (u, _, _) => arms(u) == 0L }
    val g1 = graft.ops.EventOps.diffInDiff(
      oneArm.toDF("u", "t", "us"), "u", "t", "us", "buy", 500L).head()
    assert(g1.getLong(1) == 0L && g1.isNullAt(4) && g1.isNullAt(6))
  }

  test("cupedAb: perfect covariate gives var_reduction 1; constant covariate falls back to raw") {
    import spark.implicits._
    // per user u: X = u%3 pre events, Y = 2X post events → Y = 2X exactly,
    // θ = 2, ρ² = 1, and the adjusted effect nets out the arm X-imbalance
    val rows = (1 to 12).flatMap { u =>
      Seq((u.toLong, "view", 50L)) ++
        (0 until u % 3).map(i => (u.toLong, "buy", 100L + i)) ++
        (0 until 2 * (u % 3)).map(i => (u.toLong, "buy", 1000L + i))
    }
    val r = graft.ops.EventOps.cupedAb(
      rows.toDF("u", "t", "us"), "u", "t", "us", "buy", cutoverUs = 500L)
      .head()
    assert(r.getLong(0) + r.getLong(1) == 12L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12, s"theta ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    // Y = 2X: adjusted means are both 2·X̄ → adjusted effect exactly nets
    // to ~0 while the raw effect carries the arm imbalance
    assert(math.abs(r.getDouble(5)) < 1e-12,
      s"cuped effect ${r.getDouble(5)} should vanish when Y is determined by X")
    // constant covariate: X = 1 for every user → θ = 0, cuped == raw
    val const = (1 to 12).flatMap { u =>
      Seq((u.toLong, "buy", 100L)) ++
        (0 until u % 4).map(i => (u.toLong, "buy", 1000L + i))
    }
    val rc = graft.ops.EventOps.cupedAb(
      const.toDF("u", "t", "us"), "u", "t", "us", "buy", 500L).head()
    assert(rc.getDouble(2) == 0.0 && rc.getDouble(3) == 0.0)
    assert(rc.getDouble(4) == rc.getDouble(5))
  }

  test("markovAttribution: hand-computed chain; post-conversion noise ignored; no-conversion NULLs") {
    import spark.implicits._
    // u1: a→conv (+post-conv noise), u2: a→b→conv, u3: b→(null), u4: conv
    // only. Exact absorption: P_full=3/4; remove a → 3/8; remove b → 1/2.
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "conv", 20L, 2L),
      (1L, "b", 30L, 8L), (1L, "conv", 40L, 9L), // ignored: past 1st conv
      (2L, "a", 10L, 3L), (2L, "b", 20L, 4L), (2L, "conv", 30L, 5L),
      (3L, "b", 10L, 6L),
      (4L, "conv", 10L, 7L))
      .toDF("u", "t", "us", "tie")
    val got = graft.ops.EventOps.markovAttribution(
        ev, "u", "t", "us", "tie", convType = "conv")
      .orderBy("channel").collect()
    assert(got.length == 2)
    val a = got(0); val b = got(1)
    assert(a.getString(0) == "a" && b.getString(0) == "b")
    assert(a.getDouble(1) == 0.75 && b.getDouble(1) == 0.75)
    assert(a.getDouble(2) == 0.375 && b.getDouble(2) == 0.5)
    assert(a.getDouble(3) == 0.5, s"removal_effect(a) ${a.getDouble(3)}")
    assert(math.abs(b.getDouble(3) - 1.0 / 3.0) < 1e-15)
    assert(a.getDouble(4) == 0.6 && b.getDouble(4) == 0.4)
    // a chain with zero conversions: P_full = 0, effect/share NULL
    val noConv = Seq((1L, "a", 10L, 1L), (1L, "b", 20L, 2L),
      (2L, "b", 5L, 3L)).toDF("u", "t", "us", "tie")
    val nc = graft.ops.EventOps.markovAttribution(
        noConv, "u", "t", "us", "tie", convType = "conv")
      .orderBy("channel").collect()
    assert(nc.length == 2)
    nc.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.isNullAt(3) && r.isNullAt(4))
    }
    // sentinel-colliding touch types reject loudly
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.markovAttribution(
        Seq((1L, "__start__", 1L, 1L)).toDF("u", "t", "us", "tie"),
        "u", "t", "us", "tie", convType = "conv")
    }
  }

  test("seasonalDecompose: pure weekly pattern decomposes exactly; edges NULL; gap days zero-fill") {
    import spark.implicits._
    // 21 days starting at epoch day 18900 (≡ 0 mod 7); v_t = (t mod 7) + 1
    // events per day → trend = 4 exactly on interior days, seasonal =
    // pos − 3, remainder = 0 EXACTLY (the decomposition identity).
    val rows = for {
      t <- 0 until 21
      k <- 0 until (t % 7) + 1
    } yield (java.time.LocalDate.ofEpochDay(18900L + t).toString +
      s" 0$k:30:00")
    val ev = rows.toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val got = graft.ops.EventOps.seasonalDecompose(ev, "ts", period = 7)
      .collect()
    assert(got.length == 21)
    got.foreach { r =>
      val day = r.getDate(0).toLocalDate
      val t = (day.toEpochDay - 18900L).toInt
      assert(r.getLong(1) == t % 7, s"pos at $day")
      assert(r.getLong(2) == (t % 7) + 1, s"value at $day")
      if (t < 3 || t > 17) {
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
          s"edge day $day must have NULL components")
      } else {
        assert(r.getDouble(3) == 4.0, s"trend at $day: ${r.getDouble(3)}")
        assert(r.getDouble(4) == (t % 7 - 3).toDouble, s"seasonal at $day")
        assert(r.getDouble(5) == 0.0, s"remainder at $day must be EXACT 0")
      }
    }
    // a silent day inside the range zero-fills instead of vanishing:
    // single event on day 0 and day 14 → 15 spine days, day 7 value 0
    val sparse = Seq(
      java.time.LocalDate.ofEpochDay(18900L).toString + " 01:00:00",
      java.time.LocalDate.ofEpochDay(18914L).toString + " 01:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val sp = graft.ops.EventOps.seasonalDecompose(sparse, "ts", period = 7)
      .collect()
    assert(sp.length == 15)
    assert(sp(7).getLong(2) == 0L, "gap day must zero-fill")
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.seasonalDecompose(sparse, "ts", period = 6)
    }
  }
}
