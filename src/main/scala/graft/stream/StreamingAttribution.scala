package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming last-touch attribution — the online twin of the batch
  * `Behavior.lastTouchAttribution` (q117): each conversion is credited
  * to the user's most recent touch within the horizon, or "organic".
  * The batch op is the oracle: an in-order replay must produce rows
  * whose per-channel roll-up equals the batch output
  * (StreamingAttributionSpec asserts this).
  *
  * State per user is ONE ValueState holding the latest touch
  * (epoch, type) — O(users) total, independent of event volume,
  * point-overwritten on every touch. Emission is per conversion
  * (Append mode), which is what a downstream revenue-attribution
  * ledger wants: one immutable credit row per purchase, as it happens.
  *
  * In-batch ordering: rows inside a micro-batch are processed in
  * (epoch, isConversion, id) order — touches before a same-second
  * conversion — replicating the batch window's sort exactly, so
  * replay parity holds even when one micro-batch carries a whole
  * touch→conversion chain.
  */
object StreamingAttribution {

  final case class AttrEvent(user_id: Long, event_type: String,
                             ts: Timestamp, event_id: Long)
  final case class Credit(user_id: Long, event_id: Long, channel: String,
                          lag_sec: Long)

  val ConversionType = "purchase"
  val TouchTypes: Set[String] = Set("click", "view")
  val HorizonSec = 3600L

  final case class Touch(ep: Long, tt: String)

  final class AttributionProcessor
      extends StatefulProcessor[Long, AttrEvent, Credit] {
    @transient private var lastTouch: ValueState[Touch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTouch = getHandle.getValueState[Touch]("lastTouch",
        Encoders.product[Touch], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[AttrEvent],
                                 tv: TimerValues): Iterator[Credit] = {
      val ordered = rows.toSeq.sortBy(e =>
        (e.ts.getTime / 1000L, if (e.event_type == ConversionType) 1 else 0,
          e.event_id))
      val out = Seq.newBuilder[Credit]
      ordered.foreach { e =>
        val ep = e.ts.getTime / 1000L
        if (TouchTypes.contains(e.event_type))
          lastTouch.update(Touch(ep, e.event_type))
        else if (e.event_type == ConversionType) {
          val t = if (lastTouch.exists()) Some(lastTouch.get()) else None
          val credit = t match {
            case Some(Touch(tep, tt)) if ep - tep <= HorizonSec =>
              Credit(uid, e.event_id, tt, ep - tep)
            case _ => Credit(uid, e.event_id, "organic", -1L)
          }
          out += credit
        }
      }
      out.result().iterator
    }
  }

  /** Per-conversion attribution credits over a stream with
    * user_id/event_type/ts/event_id columns. Requires the RocksDB
    * state store provider (transformWithState). */
  def credits(events: DataFrame): Dataset[Credit] = {
    implicit val eEnc = Encoders.product[AttrEvent]
    implicit val cEnc = Encoders.product[Credit]
    implicit val kEnc = Encoders.scalaLong
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
