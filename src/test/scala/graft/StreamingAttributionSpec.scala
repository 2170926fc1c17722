package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamingAttribution

/** The streaming attributor's oracle is the batch operator: replaying
  * the BehaviorSpec fixture must yield credits whose per-channel
  * roll-up equals `Behavior.lastTouchAttribution`'s rows. */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2025-01-0$s:00")

  // the q117 unit fixture: in-horizon click, out-of-horizon click,
  // no-touch purchase, same-second view→purchase
  private val fixture = Seq(
    (1L, "view", ts("1 10:00"), 1L), (1L, "click", ts("1 10:30"), 2L),
    (1L, "purchase", ts("1 11:00"), 3L),
    (2L, "click", ts("1 08:00"), 4L),
    (2L, "purchase", ts("1 10:00"), 5L),
    (3L, "purchase", ts("1 09:00"), 6L),
    (4L, "view", ts("1 12:00"), 7L),
    (4L, "purchase", ts("1 12:00"), 8L))

  test("replay credits match the batch attribution roll-up; state spans batches") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String, Timestamp, Long)](spark)
      val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id")
      val name = s"credits_${System.nanoTime()}"
      val q = StreamingAttribution.credits(df)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // split MID-CHAIN: user 1's touches arrive a batch before the
        // purchase, so the credit must come from persisted state
        input.addData(fixture.take(2))
        q.processAllAvailable()
        input.addData(fixture.drop(2))
        q.processAllAvailable()
      } finally q.stop()

      val credits = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      // per-conversion: u1 click@1800s, u2 organic, u3 organic, u4 view@0
      assert(credits.toSet === Set(
        (1L, 3L, "click", 1800L),
        (2L, 5L, "organic", -1L),
        (3L, 6L, "organic", -1L),
        (4L, 8L, "view", 0L)))

      // roll-up equals the batch operator on the same data
      val batch = graft.ops.Behavior.lastTouchAttribution(
          fixture.toDF("user_id", "event_type", "ts", "event_id"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val streamRollup = credits.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      assert(streamRollup === batch)
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
