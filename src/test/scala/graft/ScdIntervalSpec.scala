package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{IntervalJoin, Scd}

class ScdIntervalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2 collapses no-change events and stitches intervals") {
    val changes = Seq(
      (1L, ts("2025-01-01 10:00:00"), 1L, "bronze"),
      (1L, ts("2025-01-01 11:00:00"), 2L, "bronze"), // no-op update
      (1L, ts("2025-01-01 12:00:00"), 3L, "gold"),
      (1L, ts("2025-01-01 13:00:00"), 4L, "bronze"), // re-demotion reopens
      (2L, ts("2025-01-01 09:00:00"), 5L, "silver"))
      .toDF("user_id", "ts", "event_id", "status")
    val got = Scd.scd2(changes, "user_id", "ts", "status", "event_id")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    def ep(s: String) = ts(s).getTime / 1000
    assert(got.toSeq === Seq(
      (1L, "bronze", ep("2025-01-01 10:00:00"),
        Some(ep("2025-01-01 12:00:00")), 0L), // 11:00 no-op collapsed
      (1L, "gold", ep("2025-01-01 12:00:00"),
        Some(ep("2025-01-01 13:00:00")), 0L),
      (1L, "bronze", ep("2025-01-01 13:00:00"), None, 1L),
      (2L, "silver", ep("2025-01-01 09:00:00"), None, 1L)))
  }

  test("scd2 breaks exact-timestamp ties on the tie column") {
    val t = ts("2025-01-01 10:00:00")
    val changes = Seq(
      (1L, t, 2L, "b"), (1L, t, 1L, "a")) // same instant, id order wins
      .toDF("user_id", "ts", "event_id", "status")
    val got = Scd.scd2(changes, "user_id", "ts", "status", "event_id")
      .orderBy("valid_from", "attr").collect()
      .map(r => (r.getString(1), r.getLong(4)))
    assert(got.toSet === Set(("a", 0L), ("b", 1L))) // a opened, b current
  }

  test("scd2 is null-safe: transitions to/from NULL open intervals") {
    // bronze → NULL (deletion) → bronze must be three intervals; the
    // NULL run in user 2 collapses to one interval
    val changes = Seq(
      (1L, ts("2025-01-01 10:00:00"), 1L, Some("bronze")),
      (1L, ts("2025-01-01 11:00:00"), 2L, None),
      (1L, ts("2025-01-01 12:00:00"), 3L, Some("bronze")),
      (2L, ts("2025-01-01 09:00:00"), 4L, None),
      (2L, ts("2025-01-01 10:00:00"), 5L, None))
      .toDF("user_id", "ts", "event_id", "status")
    val got = Scd.scd2(changes, "user_id", "ts", "status", "event_id")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(4)))
    assert(got === Seq(
      (1L, Some("bronze"), 0L), (1L, None, 0L), (1L, Some("bronze"), 1L),
      (2L, None, 1L)))
  }

  test("scd2 same-second A->B->A flip: (key, valid_from, attr) ties carry distinct valid_to") {
    // the q78 ordering hazard: sub-second flips floor to one epoch
    // second, so the two "a" intervals tie on (user_id, valid_from,
    // attr) — the sort key must extend to valid_to (NULLS LAST) for a
    // deterministic cross-engine order. Millisecond steps inside one
    // second: ts() parses whole seconds, so build via Timestamp math.
    val base = ts("2025-01-01 10:00:00")
    def plus(ms: Long) = new java.sql.Timestamp(base.getTime + ms)
    val changes = Seq(
      (1L, plus(0), 1L, "a"), (1L, plus(200), 2L, "b"),
      (1L, plus(400), 3L, "a"))
      .toDF("user_id", "ts", "event_id", "status")
    val got = Scd.scd2(changes, "user_id", "ts", "status", "event_id")
      .orderBy(col("user_id"), col("valid_from"), col("attr"),
        col("valid_to").asc_nulls_last)
      .collect()
      .map(r => (r.getString(1), Option(r.get(3)), r.getLong(4)))
    val vf = base.getTime / 1000
    // all three intervals share valid_from = floor(epoch); the two "a"
    // rows order by valid_to (closed one first, open current last)
    assert(got.toSeq === Seq(
      ("a", Some(vf), 0L), ("a", None, 1L), ("b", Some(vf), 0L)))
  }

  test("asOf reads the state valid at the instant, half-open") {
    val changes = Seq(
      (1L, ts("2025-01-01 10:00:00"), 1L, "bronze"),
      (1L, ts("2025-01-01 12:00:00"), 2L, "gold"),
      (2L, ts("2025-01-01 09:00:00"), 3L, "silver"))
      .toDF("user_id", "ts", "event_id", "status")
    val hist = Scd.scd2(changes, "user_id", "ts", "status", "event_id")
    def at(s: String) = Seq(
      ts(s).getTime / 1000).toDF("at")
    // 11:00 — user 1 still bronze; exactly 12:00 — gold (valid_from
    // inclusive, valid_to exclusive); 08:00 — user 2 not yet present
    val at11 = Scd.asOf(hist, at("2025-01-01 11:00:00"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at11 === Map(1L -> "bronze", 2L -> "silver"))
    val at12 = Scd.asOf(hist, at("2025-01-01 12:00:00"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at12(1L) === "gold")
    val at8 = Scd.asOf(hist, at("2025-01-01 08:00:00")).collect()
    assert(at8.isEmpty)
  }

  test("applyCdc: latest-wins upserts, deletes, inserts, passthrough") {
    val base = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "v")
    val changes = Seq(
      (1L, "U", 1L, "A2"), (1L, "D", 2L, null), // later delete wins
      (2L, "U", 5L, "B2"),                      // plain update
      (4L, "U", 1L, "Dnew"),                    // insert
      (5L, "D", 1L, null))                      // delete of absent key
      .toDF("k", "op", "seq", "v")
    val got = Scd.applyCdc(base, changes, "k", "seq", "op", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((2L, "B2"), (3L, "C"), (4L, "Dnew")))
    // same-seq U/D tie resolves to the delete, deterministically
    val tie = Seq((3L, "U", 7L, "C2"), (3L, "D", 7L, null))
      .toDF("k", "op", "seq", "v")
    val t = Scd.applyCdc(base, tie, "k", "seq", "op", Seq("v"))
      .orderBy("k").collect().map(_.getLong(0))
    assert(t.toSeq === Seq(1L, 2L))
    // same-seq same-op duplicates resolve by payload (max wins, nulls
    // smallest) — a total order, not partition arrival order
    val dup = Seq((2L, "U", 9L, "Bx"), (2L, "U", 9L, "By"),
      (3L, "U", 9L, null.asInstanceOf[String]), (3L, "U", 9L, "Ca"))
      .toDF("k", "op", "seq", "v")
    val d = Scd.applyCdc(base, dup, "k", "seq", "op", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(d.toSeq === Seq((1L, "A"), (2L, "By"), (3L, "Ca")))
  }

  test("intervalJoin honors [start, end) bounds across bucket spans") {
    val facts = Seq(
      (1L, 999L), (2L, 1000L), (3L, 5000L), (4L, 7199L), (5L, 7200L))
      .toDF("id", "ep")
    // one interval spanning 2+ hour buckets, one degenerate
    val ivs = Seq((10L, 1000L, 7200L), (11L, 500L, 500L))
      .toDF("iv_id", "s", "e")
    val got = IntervalJoin
      .intervalJoin(facts, ivs, "ep", "s", "e", bucketSec = 3600L)
      .select("id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 999 < start excluded; 1000 inclusive; 7200 = end exclusive;
    // each matching fact appears exactly once despite the 3-bucket span
    assert(got.toSeq.sorted === Seq((2L, 10L), (3L, 10L), (4L, 10L)))
  }

  test("intervalJoin plans a hash equi-join, not BNLJ/cartesian") {
    val facts = (0L until 100L).map(i => (i, i * 60)).toDF("id", "ep")
    val ivs = (0L until 50L).map(i => (i, i * 100, i * 100 + 90))
      .toDF("iv_id", "s", "e")
    val plan = IntervalJoin.intervalJoin(facts, ivs, "ep", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
