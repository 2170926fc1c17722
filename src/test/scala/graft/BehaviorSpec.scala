package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2025-01-0$s:00")

  // user 1: completes the full funnel inside the horizons
  // user 2: views and clicks, purchase arrives AFTER the 1h horizon
  // user 3: clicks BEFORE viewing (order violation — stops at step 1)
  // user 4: never views (enters no funnel)
  private lazy val events = Seq(
    (1L, "view", ts("1 10:00")), (1L, "click", ts("1 10:30")),
    (1L, "purchase", ts("1 11:00")),
    (2L, "view", ts("1 09:00")), (2L, "click", ts("1 09:10")),
    (2L, "purchase", ts("1 12:00")),
    (3L, "click", ts("1 08:00")), (3L, "view", ts("1 08:30")),
    (4L, "purchase", ts("1 07:00")))
    .toDF("user_id", "event_type", "ts")

  test("funnel counts reached-at-least users per step with horizons") {
    val got = Behavior.funnel(events, Seq("view", "click", "purchase"),
      horizonSec = 3600).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) === (("view", 3L, 100.0)))   // users 1, 2, 3
    assert(got(2L) === (("click", 2L, 66.67))) // users 1, 2
    assert(got(3L) === (("purchase", 1L, 33.33))) // user 1 only
  }

  test("funnel transition must be strictly after the previous step") {
    val sameInstant = Seq(
      (1L, "view", ts("1 10:00")), (1L, "click", ts("1 10:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.funnel(sameInstant, Seq("view", "click"),
      horizonSec = 3600).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // click at the identical second does not count as "after the view"
    assert(got === Map(1L -> 1L, 2L -> 0L))
  }

  test("retention buckets users by first-seen day and week offset") {
    val e = Seq(
      (1L, ts("1 10:00")), (1L, ts("9 10:00")),   // day 0, week 1
      (2L, ts("1 11:00")),                         // day 0 only
      (3L, ts("2 10:00")), (3L, ts("2 23:00")),   // same-day dup collapses
      (3L, ts("9 01:00")))                         // day+7 → week 1
      .toDF("user_id", "ts")
    val got = Behavior.retention(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val d1 = got.keys.map(_._1).min // cohort day of Jan 1
    assert(got(( d1, 0L)) === ((2L, 100.0)))      // users 1,2 on day 0
    assert(got((d1, 1L)) === ((1L, 50.0)))        // user 1 retained wk 1
    assert(got((d1 + 1, 0L)) === ((1L, 100.0)))   // user 3 cohort
    assert(got((d1 + 1, 1L)) === ((1L, 100.0)))   // user 3 wk 1
    assert(got.size === 4)
  }

  test("rateAnomaly flags a spike against its trailing baseline only") {
    // 10 buckets of a flat-ish series (counts 10,11 alternating) then a
    // 30-count spike: the spike's baseline is the 8 buckets before it
    val base = 1700000000L - (1700000000L % 900)
    val rows = (0 until 10).flatMap { b =>
      val n = if (b % 2 == 0) 10 else 11
      (0 until n).map(i => ("click", new Timestamp((base + b * 900) * 1000L)))
    } ++ (0 until 30).map(i =>
      ("click", new Timestamp((base + 10 * 900) * 1000L)))
    val df = rows.toDF("event_type", "ts")
    val got = Behavior.rateAnomaly(df, trailing = 8, minZ = 2.0).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("bucket") === base + 10 * 900)
    assert(r.getAs[Long]("n") === 30)
    // baseline = buckets 2..9 (counts 10,11 × 4) → mean 10.5, std 0.5
    assert(r.getAs[Double]("baseline_mean") === 10.5)
    assert(r.getAs[Long]("z_micro") === ((30 - 10.5) / 0.5 * 1e6).toLong)
  }

  test("rateAnomaly requires a full trailing window and nonzero variance") {
    // constant series: std 0 everywhere → nothing scored, even though
    // every bucket from index 8 has a full window
    val base = 1700000000L - (1700000000L % 900)
    val flat = (0 until 12).flatMap(b => (0 until 5).map(_ =>
      ("view", new Timestamp((base + b * 900) * 1000L))))
      .toDF("event_type", "ts")
    assert(Behavior.rateAnomaly(flat).count() === 0)
  }

  test("lastTouchAttribution credits the latest in-horizon touch, else organic") {
    val e = Seq(
      // u1: view 10:00, click 10:30, purchase 11:00 → click, lag 1800
      (1L, "view", ts("1 10:00"), 1L), (1L, "click", ts("1 10:30"), 2L),
      (1L, "purchase", ts("1 11:00"), 3L),
      // u2: click 08:00, purchase 10:00 → outside 1h horizon → organic
      (2L, "click", ts("1 08:00"), 4L),
      (2L, "purchase", ts("1 10:00"), 5L),
      // u3: purchase with no touches at all → organic
      (3L, "purchase", ts("1 09:00"), 6L),
      // u4: view at the SAME second as the purchase still attributes
      (4L, "view", ts("1 12:00"), 7L),
      (4L, "purchase", ts("1 12:00"), 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.lastTouchAttribution(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.getAs[java.lang.Double]("avg_lag_sec"))))).toMap
    assert(got("click") === ((1L, Some(1800.0))))
    assert(got("view") === ((1L, Some(0.0))))
    assert(got("organic") === ((2L, None)))
  }

  test("lastTouchAttribution: an error event never takes credit") {
    val e = Seq(
      (1L, "view", ts("1 10:00"), 1L),
      (1L, "error", ts("1 10:30"), 2L), // not a touch type — invisible
      (1L, "purchase", ts("1 10:45"), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.lastTouchAttribution(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("view" -> 1L))
  }

  test("ewmaForecast: weights decay over the truncated window, gate on full lags") {
    val base = 1700000000L - (1700000000L % 900)
    // 17 buckets with counts 1..17 — only the last has 16 full lags
    val e = (0 until 17).flatMap { b =>
      (0 to b).map(_ => ("view", new Timestamp((base + b * 900) * 1000L)))
    }.toDF("event_type", "ts")
    val got = Behavior.ewmaForecast(e).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("bucket") === base + 16 * 900)
    assert(r.getAs[Long]("n") === 17L)
    // independently recompute: forecast from counts 16,15,…,1 (lag 1..16)
    val weights = (1 to 16).map(i => 0.3 * math.pow(0.7, i - 1))
    val expected = (1 to 16).map(i => (17 - i).toDouble * weights(i - 1))
      .foldLeft(0.0)(_ + _) / weights.sum
    assert(r.getAs[Long]("forecast_micro") === math.round(expected * 1e6))
    assert(r.getAs[Long]("residual_micro") === math.round((17 - expected) * 1e6))
  }

  test("wilsonRate: hand-computed interval, bounds inside [0,1], order-safe") {
    // user 1: 1 purchase / 4 trials; user 2: 0 / 2 (rate 0, lo must be 0-ish)
    val e = Seq(
      (1L, "view"), (1L, "view"), (1L, "view"), (1L, "purchase"),
      (2L, "view"), (2L, "view"),
      (1L, "error")) // not a trial type — ignored
      .map { case (u, t) => (u, t, ts("1 10:00")) }
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.wilsonRate(e, "purchase", Seq("view", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n") === 4L && r1.getAs[Long]("s") === 1L)
    assert(r1.getAs[Long]("rate_micro") === 250000L)
    // independent Wilson computation
    val (z, n, p) = (1.96, 4.0, 0.25)
    val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = p + z2 / (2.0 * n)
    val margin = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    assert(r1.getAs[Long]("lo_micro") ===
      math.round((center - margin) / denom * 1e6))
    assert(r1.getAs[Long]("hi_micro") ===
      math.round((center + margin) / denom * 1e6))
    assert(r1.getAs[Long]("lo_micro") >= 0L &&
      r1.getAs[Long]("hi_micro") <= 1000000L)
    val r2 = got(2L)
    assert(r2.getAs[Long]("rate_micro") === 0L)
    assert(r2.getAs[Long]("lo_micro") === 0L) // p=0 → margin = center
  }

  test("timeToConvert: earliest entry to earliest later conversion, strict after") {
    val e = Seq(
      // u1: view 10:00, purchase 10:30 → lag 1800
      (1L, "view", ts("1 10:00")), (1L, "purchase", ts("1 10:30")),
      // u2: purchase BEFORE any view → never converts
      (2L, "purchase", ts("1 09:00")), (2L, "view", ts("1 10:00")),
      // u3: two purchases after view — earliest wins (lag 600)
      (3L, "view", ts("1 08:00")), (3L, "purchase", ts("1 08:10")),
      (3L, "purchase", ts("1 09:00")))
      .toDF("user_id", "event_type", "ts")
    val r = Behavior.timeToConvert(e, "view", "purchase").collect().head
    assert(r.getAs[Long]("n_converted") === 2L)
    assert(r.getAs[Long]("min_lag") === 600L)
    assert(r.getAs[Long]("max_lag") === 1800L)
    assert(r.getAs[Long]("p50_lag") === 600L) // quantile_disc convention
  }

  test("rollingActiveUsers: window membership, observed days only") {
    // user 1 on days 0 and 3; user 2 on day 3; window 3 days
    val e = Seq(
      (1L, ts("1 10:00")), (1L, ts("4 10:00")), (2L, ts("4 11:00")))
      .toDF("user_id", "ts")
    val got = Behavior.rollingActiveUsers(e, windowDays = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val d0 = got.keys.min
    // day 0: only user 1 active, window [-2..0] → mau 1
    assert(got(d0) === ((1L, 1L, 1.0)))
    // day 3: dau 2; window [1..3] contains only day 3 (day 0 aged out)
    assert(got(d0 + 3) === ((2L, 2L, 1.0)))
    assert(got.size === 2) // days 1,2 unobserved → no rows
  }

  test("rollingActiveUsersSketch estimates track the exact form") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = Behavior.rollingActiveUsers(e).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val est = Behavior.rollingActiveUsersSketch(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (day, mau) =>
      val d = math.abs(est(day) - mau).toDouble / mau
      assert(d <= 0.05, s"day $day: sketch ${est(day)} vs exact $mau")
    }
  }

  test("cohortValue: cumulative revenue and integer LTV per cohort week") {
    // cohort A (day of '01'): users 1,2 week 0 (10.00 + 2.00), user 1
    // returns week 1 (5.00); cohort B (day of '02'): user 3 (1.00)
    val e = Seq(
      (1L, ts("1 10:00"), 10.0), (2L, ts("1 11:00"), 2.0),
      (1L, ts("9 10:00"), 5.0),
      (3L, ts("2 10:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val got = Behavior.cohortValue(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val a = got.keys.map(_._1).min
    assert(got((a, 0L)) === ((2L, 1200L, 1200L, 6000000L)))
    // week 1: one active user, but LTV divides by the COHORT size (2)
    assert(got((a, 1L)) === ((1L, 500L, 1700L, 8500000L)))
    assert(got((a + 1, 0L)) === ((1L, 100L, 100L, 1000000L)))
    assert(got.size === 3)
  }

  test("bounceRate: single-event sessions count as bounces on their start day") {
    // user 1: two events 10 min apart (one session, no bounce), then a
    // second session 2 h later with ONE event (bounce, same day);
    // user 2: one event (bounce) on the next day
    val e = Seq(
      (1L, ts("1 10:00"), 1L), (1L, ts("1 10:10"), 2L),
      (1L, ts("1 13:00"), 3L),
      (2L, ts("2 09:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val got = Behavior.bounceRate(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val d1 = got.keys.min
    assert(got(d1) === ((2L, 1L, 50.0)))
    assert(got(d1 + 1) === ((1L, 1L, 100.0)))
    assert(got.size === 2)
  }

  test("pathTrigrams: session gaps break paths, counts aggregate across users") {
    val e = Seq(
      // user 1, one session: a b c d → trigrams abc, bcd
      (1L, "a", ts("1 10:00"), 1L), (1L, "b", ts("1 10:01"), 2L),
      (1L, "c", ts("1 10:02"), 3L), (1L, "d", ts("1 10:03"), 4L),
      // user 1, NEW session (gap > 30 min): a b c → abc again
      (1L, "a", ts("1 12:00"), 5L), (1L, "b", ts("1 12:01"), 6L),
      (1L, "c", ts("1 12:02"), 7L),
      // user 2: a b then session break — no trigram across the gap
      (2L, "a", ts("1 09:00"), 8L), (2L, "b", ts("1 09:01"), 9L),
      (2L, "c", ts("1 11:00"), 10L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.pathTrigrams(e, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got === Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
  }

  test("entropyHistogram: single-type user at H=0, uniform 2-type at ln 2") {
    val ev = (Seq.fill(10)((1L, "a")) ++
      Seq.fill(5)((2L, "a")) ++ Seq.fill(5)((2L, "b")))
      .map { case (u, t) => (u, t, ts("1 10:00")) }
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.entropyHistogram(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ln 2 = 0.693147… → 693147 micro → centi-nat bucket 69
    assert(got.toSeq === Seq((0L, 1L, 0L, 0L), (69L, 1L, 693147L, 693147L)))
  }

  test("dowSeasonality: integer shares and a 7-normalized index") {
    // epoch day 0 = Thursday → dow 4; day 3 → Sunday → dow 0
    def at(day: Long) = new Timestamp(day * 86400000L + 3600000L)
    val ev = Seq(
      (1L, "e", at(0), 1.0), (2L, "e", at(0), 1.0), (3L, "e", at(3), 3.0))
      .toDF("user_id", "event_type", "ts", "value")
    val got = Behavior.dowSeasonality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 300L, 600000L, 4200000L),
      (4L, 2L, 200L, 400000L, 2800000L)))
  }

  test("activityTransitions: new/retained/resurrected/churn decomposition") {
    // user A active weeks {0,1,3}; user B active week {1}; max week 3
    def wk(w: Long) = new Timestamp(w * 7L * 86400000L + 1000L)
    val ev = Seq(
      (10L, "e", wk(0)), (10L, "e", wk(1)), (10L, "e", wk(3)),
      (20L, "e", wk(1)))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.activityTransitions(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      // week 0: A is new; A is active in week 1 → not churned
      (0L, 1L, 1L, 0L, 0L, 0L),
      // week 1: B new, A retained; both absent week 2 → both churn
      (1L, 2L, 1L, 1L, 0L, 2L),
      // week 3: A resurrected (gap over week 2); churn right-censored
      (3L, 1L, 0L, 0L, 1L, 0L)))
    // growth accounting reconciles: new + retained + resurrected = active
    got.foreach { case (_, active, nw, ret, res, _) =>
      assert(nw + ret + res === active)
    }
  }

  test("cadenceHistogram: base-2 digit buckets over per-user sorted gaps") {
    // user 1 eps: 0, 0, 1, 4, 20 → gaps 0, 1, 3, 16 → buckets 0, 1, 2, 5
    def at(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(0L, 0L, 1L, 4L, 20L).map(s => (1L, "e", at(s)))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.cadenceHistogram(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 1L), (1L, 1L, 1L, 1L), (2L, 2L, 3L, 1L),
      (5L, 16L, 31L, 1L)))
  }

  test("survivalCurve: hand-computed KM risk sets and log-survival") {
    // durations: u1 weeks {0,1} → t=1 churn; u2 {0} → t=0 churn;
    // u3 {0,2} → t=2 censored; u4 {2} → t=0 censored (max week = 2)
    def wk(w: Long) = new Timestamp(w * 7L * 86400000L + 1000L)
    val ev = Seq(
      (1L, "e", wk(0)), (1L, "e", wk(1)),
      (2L, "e", wk(0)),
      (3L, "e", wk(0)), (3L, "e", wk(2)),
      (4L, "e", wk(2)))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.survivalCurve(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    // t=0: risk 4, 1 churn (u2), 1 censored (u4) → S factor 3/4
    assert(got(0L).getLong(1) === 4L)
    assert(got(0L).getLong(2) === 1L)
    assert(got(0L).getLong(3) === 1L)
    val t0 = math.round(math.log(3.0 / 4.0) * 1e9)
    assert(got(0L).getLong(4) === t0)
    // t=1: risk 2, 1 churn (u1) → cumulative factor ×1/2
    assert(got(1L).getLong(1) === 2L)
    assert(got(1L).getLong(4) === t0 + math.round(math.log(0.5) * 1e9))
    // t=2: risk 1, censored only — survival unchanged
    assert(got(2L).getLong(2) === 0L)
    assert(got(2L).getLong(4) === got(1L).getLong(4))
  }

  test("survivalCurve: a fully-absorbed risk set nulls S from there on") {
    // u1 {0} churn t=0; u2 {0,1} churn t=1 (risk set 1, all churn);
    // u3 {2} censored t=0 keeps max week at 2
    def wk(w: Long) = new Timestamp(w * 7L * 86400000L + 1000L)
    val ev = Seq(
      (1L, "e", wk(0)),
      (2L, "e", wk(0)), (2L, "e", wk(1)),
      (3L, "e", wk(2)))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.survivalCurve(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got(0L).isNullAt(4)) // S > 0 at t=0
    assert(got(1L).getLong(1) === 1L && got(1L).getLong(2) === 1L)
    assert(got(1L).isNullAt(4)) // d = n ⇒ S hits 0 ⇒ ln undefined
  }
}
