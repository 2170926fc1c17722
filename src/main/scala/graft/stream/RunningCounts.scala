package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming running per-key counters on Spark 4's `MapState` — the
  * point-updatable keyed state a fraud counter / feature store needs:
  * each user's per-event-type counts live as individual map entries, so
  * a batch touching one event type reads and writes ONE entry instead
  * of deserializing and rewriting the whole per-user blob (what a
  * `ValueState[Map]` — or flatMapGroupsWithState's single-blob
  * `GroupState` — would do). On RocksDB, entries are separate store
  * keys, so state size per user can grow without per-batch rewrite
  * cost.
  *
  * Emits the (user_id, event_type, n) rows whose count changed in the
  * micro-batch — run the query in Update output mode.
  */
object RunningCounts {

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  final class CountProcessor
      extends StatefulProcessor[Long, TypedEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[TypedEvent],
                                 tv: TimerValues): Iterator[TypeCount] = {
      // collapse the batch per type first: one state read+write per
      // DISTINCT type in the batch, not per event
      val perType = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      perType.iterator.map { case (t, delta) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + delta
        counts.updateValue(t, n)
        TypeCount(uid, t, n)
      }.toSeq.iterator
    }
  }

  /** Running (user, event_type) counts over a stream with
    * user_id/ts/event_type columns; emits changed counters per batch.
    * Requires the RocksDB state store provider (transformWithState). */
  def typeCounts(events: DataFrame): Dataset[TypeCount] = {
    implicit val eEnc = Encoders.product[TypedEvent]
    implicit val cEnc = Encoders.product[TypeCount]
    implicit val kEnc = Encoders.scalaLong
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CountProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
