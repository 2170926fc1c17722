package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Behavior
import graft.stream.StreamingFunnel

/** The streaming funnel's oracle is the BATCH funnel: the final
  * per-user deepest step over the fixture (delivered out of order
  * within the batch) must reproduce `Behavior.funnel`'s
  * reached-at-least counts exactly — including the order-violation
  * (click before view) and horizon-expiry (purchase too late) cases,
  * which are the semantics a naive per-arrival automaton gets wrong.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2025-01-0$s:00")

  // the BehaviorSpec funnel fixture verbatim:
  // user 1 completes; user 2's purchase is past the 1h horizon;
  // user 3 clicks before viewing; user 4 never views
  private val fixture = Seq(
    (1L, "view", ts("1 10:00")), (1L, "click", ts("1 10:30")),
    (1L, "purchase", ts("1 11:00")),
    (2L, "view", ts("1 09:00")), (2L, "click", ts("1 09:10")),
    (2L, "purchase", ts("1 12:00")),
    (3L, "click", ts("1 08:00")), (3L, "view", ts("1 08:30")),
    (4L, "purchase", ts("1 07:00")))

  test("final deepest-step updates reproduce the batch funnel exactly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val df = input.toDF().toDF("user_id", "event_type", "ts")
    val name = s"sfunnel_${System.nanoTime()}"
    val q = StreamingFunnel.funnel(df,
        Seq("view", "click", "purchase"), horizonSec = 3600)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      // one batch, deliberately scrambled: the watermark-buffered
      // in-order fold must not depend on arrival order
      input.addData(fixture.reverse)
      q.processAllAvailable()
      // step-typed watermark sentinels from a dummy user (two pushes —
      // the watermark lags a batch); non-step types never reach the
      // watermark operator and would not advance it
      input.addData(Seq((99L, "view", ts("1 23:00"))))
      q.processAllAvailable()
      input.addData(Seq((99L, "view", ts("1 23:30"))))
      q.processAllAvailable()
    } finally q.stop()

    val deepest = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .filter(_._1 != 99L)
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    // user 1 full chain, user 2 stops at click (horizon), user 3 at
    // view (order violation), user 4 never enters (no update at all)
    assert(deepest === Map(1L -> 3, 2L -> 2, 3L -> 1))

    // reached-at-least counts equal the batch funnel's n_users column
    val batch = Behavior.funnel(
      fixture.toDF("user_id", "event_type", "ts"),
      Seq("view", "click", "purchase"), horizonSec = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 to 3).foreach { step =>
      val streaming = deepest.values.count(_ >= step).toLong
      assert(streaming === batch(step.toLong), s"step $step")
    }
  }
}
