package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2025-01-01 10:00:00"), "p1"),
    (1L, ts("2025-01-01 12:00:00"), "p2"),
    (2L, ts("2025-01-01 09:00:00"), "p3"), // before any right row
    (3L, ts("2025-01-01 10:00:00"), "p4")) // key with no right rows
    .toDF("k", "t", "name")

  private lazy val right = Seq(
    (1L, ts("2025-01-01 09:30:00"), 1.0),
    (1L, ts("2025-01-01 11:00:00"), 2.0),
    (2L, ts("2025-01-01 09:00:00"), 9.0)) // equal-ts: inclusive match
    .toDF("k", "t", "v")

  test("matches latest right row at or before each left timestamp") {
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === Map(
      "p1" -> 1.0, // 10:00 matches 09:30, not 11:00
      "p2" -> 2.0, // 12:00 matches 11:00
      "p3" -> 9.0)) // equal timestamps are inclusive
  }

  test("left rows with no prior right row are dropped (inner asof)") {
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
    assert(got.count() === 3) // p4 (key 3) dropped
    assert(!got.select("name").collect().map(_.getString(0)).contains("p4"))
  }

  test("carries the matched right timestamp") {
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .filter($"name" === "p2").select("asof_ts").collect().head
    assert(got.getTimestamp(0) === ts("2025-01-01 11:00:00"))
  }
}
