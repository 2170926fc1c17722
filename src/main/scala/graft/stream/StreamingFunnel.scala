package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming ordered-step funnel — the online twin of
  * `Behavior.funnel` (q71): per user, the greedy-earliest step chain
  * (step i+1 must land strictly after the EARLIEST completion of step
  * i and within `horizonSec` of it), emitted as a per-user "deepest
  * step reached" update whenever the verdict deepens. Downstream, the
  * reached-at-least counts are one small aggregate over the latest
  * update per user — the batch funnel's output, live.
  *
  * Order is the whole problem: the greedy-earliest semantics are a
  * FOLD over the user's events in event-time order, and a stream
  * delivers them out of order. The processor therefore buffers
  * arrivals in ListState and only folds them into the automaton when
  * the WATERMARK passes their event time (event-time timer per user) —
  * at that point no earlier event can still arrive, so the in-order
  * fold is exact and each event is touched exactly twice (buffer,
  * fold). Same-second ties need no intra-tie order: a step-(i+1) event
  * at exactly reached(i)'s second is rejected by the strict `>` either
  * way (the batch convention).
  *
  * Parity with the batch op is pinned in StreamingFunnelSpec: final
  * per-user deepest over the fixture equals `Behavior.funnel`'s
  * reached-at-least counts exactly, including the order-violation and
  * horizon-expiry cases.
  *
  * State per user: the step-completion array (O(steps) longs) + the
  * buffer of not-yet-final events — bounded by the user's event count
  * within one watermark lag, NOT their history (the frontier advances
  * with the watermark and processed events leave the buffer). Late
  * events at or below the processed frontier are dropped (the
  * [[StreamingAnomaly]] frontier discipline).
  */
object StreamingFunnel {

  final case class StepEvent(u: Long, step: Int, ep: Long, ts: Timestamp)
  final case class FunnelUpdate(u: Long, deepest: Int)

  final class FunnelProcessor(nSteps: Int, horizonSec: Long)
      extends StatefulProcessor[Long, StepEvent, FunnelUpdate] {
    @transient private var buffer: ListState[(Long, Int)] = _
    @transient private var reached: ValueState[Array[Long]] = _
    @transient private var frontier: ValueState[Long] = _
    @transient private var lastDeepest: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffer = getHandle.getListState[(Long, Int)]("buffer",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt), TTLConfig.NONE)
      reached = getHandle.getValueState[Array[Long]]("reached",
        Encoders.kryo[Array[Long]], TTLConfig.NONE)
      frontier = getHandle.getValueState[Long]("frontier",
        Encoders.scalaLong, TTLConfig.NONE)
      lastDeepest = getHandle.getValueState[Int]("lastDeepest",
        Encoders.scalaInt, TTLConfig.NONE)
    }

    override def handleInputRows(u: Long, rows: Iterator[StepEvent],
                                 tv: TimerValues): Iterator[FunnelUpdate] = {
      val closed = if (frontier.exists()) frontier.get() else Long.MinValue
      rows.foreach { e =>
        if (e.ep > closed) buffer.appendValue((e.ep, e.step))
      }
      // fire once the watermark moves past anything buffered
      getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1L)
      Iterator.empty
    }

    override def handleExpiredTimer(u: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[FunnelUpdate] = {
      // events at epoch second s are final once watermark ≥ (s+1)s
      val wmSec = Math.floorDiv(tv.getCurrentWatermarkInMs(), 1000L)
      val all = buffer.get().toVector
      // second-s events are final only once wm ≥ (s+1)·1000 ms: an
      // event AT second s can carry millis up to s·1000+999, so the
      // floor alone would fold a second the stream can still append to
      val (ready, pending) = all.partition(_._1 < wmSec)
      var out: Iterator[FunnelUpdate] = Iterator.empty
      if (ready.nonEmpty) {
        val r = if (reached.exists()) reached.get()
                else Array.fill(nSteps)(Long.MinValue)
        ready.sortBy(_._1).foreach { case (ep, step) =>
          if (step == 1) {
            if (r(0) == Long.MinValue) r(0) = ep
          } else if (r(step - 1) == Long.MinValue &&
                     r(step - 2) != Long.MinValue &&
                     ep > r(step - 2) && ep <= r(step - 2) + horizonSec) {
            r(step - 1) = ep
          }
        }
        reached.update(r)
        buffer.clear()
        pending.foreach(buffer.appendValue)
        frontier.update(math.max(
          if (frontier.exists()) frontier.get() else Long.MinValue,
          ready.map(_._1).max))
        val deepest = r.lastIndexWhere(_ != Long.MinValue) + 1
        val prev = if (lastDeepest.exists()) lastDeepest.get() else 0
        if (deepest > prev) {
          lastDeepest.update(deepest)
          out = Iterator.single(FunnelUpdate(u, deepest))
        }
      }
      if (pending.nonEmpty)
        getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1L)
      out
    }
  }

  /** Per-user deepest-step update stream over raw events. Events whose
    * type is not a funnel step are filtered at the source — the
    * processor sees only step events. Requires the RocksDB state store
    * provider (transformWithState). */
  def funnel(events: DataFrame, steps: Seq[String],
             horizonSec: Long, delay: String = "10 seconds",
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): Dataset[FunnelUpdate] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    implicit val eEnc = Encoders.product[StepEvent]
    implicit val uEnc = Encoders.product[FunnelUpdate]
    implicit val kEnc = Encoders.scalaLong
    implicit val inEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.STRING, Encoders.TIMESTAMP)
    val stepIdx = steps.zipWithIndex.map { case (s, i) => (s, i + 1) }.toMap
    events
      .select(col(userCol).cast("long"), col(typeCol).cast("string"),
        col(tsCol).cast("timestamp"))
      .as[(Long, String, Timestamp)]
      .filter(r => stepIdx.contains(r._2))
      .map { case (u, t, ts) =>
        StepEvent(u, stepIdx(t), Math.floorDiv(ts.getTime, 1000L), ts)
      }
      .withWatermark("ts", delay)
      .groupByKey(_.u)
      .transformWithState(new FunnelProcessor(steps.size, horizonSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
