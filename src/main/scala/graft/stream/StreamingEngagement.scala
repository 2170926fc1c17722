package graft.stream

import java.sql.Timestamp

import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming rolling DAU / MAU-28 — the online twin of
  * `Behavior.rollingActiveUsers` / `rollingActiveUsersSketch` (q126 /
  * q136): per observed day, distinct users that day and over the
  * trailing `windowDays`, emitted once as an immutable engagement row
  * when the WATERMARK passes the day's end.
  *
  * Shape — the batch op's contribution expansion, streamed: each
  * (user, day) event maps to the `windowDays` target days it keeps the
  * user active for, keyed by TARGET day; per-day state is two HLL
  * sketches (DAU = contributions where target == event day, MAU = all),
  * so state is O(open days × sketch bytes) regardless of user count —
  * the property that makes the operator safe on an unbounded stream.
  * The ×windowDays wire amplification is the same trade the batch op
  * makes (even key distribution, no day-range self-join, no skew
  * cliff).
  *
  * Exactness vs batch: HLL register maxima are insertion-order-free,
  * and this uses the same DataSketches library, lgK, and long-update
  * path as Spark's `hll_sketch_agg`/`hll_union_agg`, so a bounded
  * in-order replay reproduces the batch sketch op's estimates — and at
  * sub-sparse cardinalities the exact DAU/MAU — exactly
  * (StreamingEngagementSpec asserts equality against BOTH batch forms).
  * Days with no own-day event (carry-over-only targets) are not
  * emitted, matching the batch op's observed-days-only contract.
  */
object StreamingEngagement {

  final case class Contribution(target_day: Long, user_id: Long,
                                is_day: Boolean, ts: Timestamp)
  final case class Engagement(day: Long, dau_est: Long, mau_est: Long)

  final class EngagementProcessor(lgK: Int)
      extends StatefulProcessor[Long, Contribution, Engagement] {
    @transient private var dau: ValueState[Array[Byte]] = _
    @transient private var mau: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      dau = getHandle.getValueState[Array[Byte]]("dau", Encoders.BINARY,
        TTLConfig.NONE)
      mau = getHandle.getValueState[Array[Byte]]("mau", Encoders.BINARY,
        TTLConfig.NONE)
    }

    private def load(s: ValueState[Array[Byte]]): HllSketch =
      if (s.exists()) HllSketch.heapify(s.get()) else new HllSketch(lgK)

    override def handleInputRows(day: Long, rows: Iterator[Contribution],
                                 tv: TimerValues): Iterator[Engagement] = {
      val d = load(dau)
      val m = load(mau)
      rows.foreach { c =>
        m.update(c.user_id)
        if (c.is_day) d.update(c.user_id)
      }
      dau.update(d.toUpdatableByteArray)
      mau.update(m.toUpdatableByteArray)
      // one close timer per open day at its end; re-arming after new
      // contributions is a delete+register of the SAME instant
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer((day + 1) * 86400000L)
      Iterator.empty
    }

    override def handleExpiredTimer(day: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Engagement] = {
      // observed-days-only: a target day nobody was active ON emits
      // nothing (its DAU sketch is empty), matching the batch op
      val out =
        if (dau.exists() && !HllSketch.heapify(dau.get()).isEmpty) {
          val de = Math.round(HllSketch.heapify(dau.get()).getEstimate)
          val me = Math.round(HllSketch.heapify(mau.get()).getEstimate)
          Iterator.single(Engagement(day, de, me))
        } else Iterator.empty
      dau.clear()
      mau.clear()
      out
    }
  }

  /** Engagement stream over raw events with user_id/ts columns.
    * Requires the RocksDB state store provider (transformWithState). */
  def engagement(events: DataFrame, windowDays: Int = 28, lgK: Int = 14,
                 delay: String = "10 seconds"): Dataset[Engagement] = {
    implicit val cEnc = Encoders.product[Contribution]
    implicit val eEnc = Encoders.product[Engagement]
    implicit val kEnc = Encoders.scalaLong
    implicit val inEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .as[(Long, Timestamp)]
      .flatMap { case (u, t) =>
        val day = Math.floorDiv(t.getTime / 1000L, 86400L)
        (0 until windowDays).map(k =>
          Contribution(day + k, u, k == 0, t))
      }
      .withWatermark("ts", delay)
      .groupByKey(_.target_day)
      .transformWithState(new EngagementProcessor(lgK),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
