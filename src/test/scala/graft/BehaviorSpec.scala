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
}
