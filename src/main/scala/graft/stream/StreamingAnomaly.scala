package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming event-rate anomaly detection — the online counterpart of
  * the batch `Behavior.rateAnomaly` (q115): per event_type, each time
  * bucket's count is z-scored against the trailing `Trailing` CLOSED
  * buckets, the bucket being scored excluded from its own baseline.
  *
  * Bucket-close semantics instead of watermark plumbing: a bucket is
  * scored when a LATER bucket first shows up for the same key (rates
  * are per-key monotone signals, so "next bucket started" is the
  * natural close signal and needs no cross-key watermark coordination).
  * Until it closes, a bucket's count keeps absorbing late rows; at
  * close the count FREEZES — a late row for ANY closed bucket is
  * dropped, including closed buckets still retained as baseline
  * history, so the baseline a score was computed against never shifts
  * after the fact (the same trade a watermark makes, with the horizon
  * measured in buckets instead of wall time — here the horizon is
  * exactly one bucket: only the open bucket absorbs).
  *
  * State per key is ONE MapState with a bounded window of bucket
  * counts (open + `Trailing` closed): entries are point-updated per
  * distinct bucket in the batch (the RunningCounts MapState rationale)
  * and pruned past the baseline horizon, so state size is
  * O(types × (Trailing+2)) regardless of stream volume — this is what
  * makes the operator safe on an unbounded 100 TB/day stream.
  *
  * Determinism: identical integer bucket counts → identical double
  * baseline math as the batch op (population std over exactly
  * `Trailing` integers), z micro-quantized. The batch op is the
  * oracle: replaying a bounded in-order stream must reproduce its
  * anomaly rows exactly (StreamingAnomalySpec asserts this).
  *
  * Gap semantics: the streaming baseline is TIME-contiguous — all
  * `Trailing` preceding time buckets must have been observed, else the
  * bucket is conservatively not scored. The batch op's ROWS frame is
  * observation-contiguous (it skips empty buckets). On a stream dense
  * enough to monitor, the two agree; on a sparse one, prefer the batch
  * op or widen BucketSec until buckets are dense.
  */
object StreamingAnomaly {

  final case class RawEvent(event_type: String, ts: Timestamp)
  final case class Anomaly(event_type: String, bucket: Long, n: Long,
                           baseline_mean: Double, z_micro: Long)

  val BucketSec: Long = 900L
  val Trailing: Int = 8
  val MinZ: Double = 2.0

  final class AnomalyProcessor
      extends StatefulProcessor[String, RawEvent, Anomaly] {
    @transient private var buckets: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buckets = getHandle.getMapState[Long, Long]("buckets",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RawEvent],
                                 tv: TimerValues): Iterator[Anomaly] = {
      // collapse the batch to per-bucket deltas: one state read+write
      // per DISTINCT bucket, not per event
      val deltas = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val b = math.floorDiv(e.ts.getTime / 1000L, BucketSec) * BucketSec
        m.updated(b, m.getOrElse(b, 0L) + 1L)
      }
      if (deltas.isEmpty) return Iterator.empty

      val known: Map[Long, Long] = buckets.iterator().toMap
      // every bucket strictly below the known max is CLOSED — OBSERVED
      // buckets were scored the moment a later bucket appeared, and
      // NEVER-OBSERVED gap buckets are frozen-at-absent: both drop
      // late deltas. For observed buckets, merging a late delta would
      // silently shift future baselines away from what the
      // already-emitted scores saw; gap buckets are frozen for
      // CONSISTENCY of the baseline-contiguity rule (a gap bucket
      // resurrected by late data would flip nearby closes from
      // not-scored to scored depending on arrival order, making output
      // replay-order-dependent). The cost: a region around a late-
      // filled gap stays unscored until Trailing fresh buckets
      // re-accumulate — the documented dense-stream assumption (see
      // the class scaladoc's gap-semantics note).
      val frontier =
        if (known.isEmpty) Long.MinValue else known.keys.max
      val merged = deltas.foldLeft(known) { case (m, (b, d)) =>
        if (b < frontier) m // late for a closed bucket: dropped
        else m.updated(b, m.getOrElse(b, 0L) + d)
      }
      val high = merged.keys.max
      // score every bucket that just closed (open before, < high now),
      // oldest first, against the Trailing buckets before it
      val newlyClosed = merged.keys.filter(b =>
        b < high && b >= frontier).toSeq.sorted
      val out = newlyClosed.flatMap { b =>
        val base = (1 to Trailing).flatMap(i =>
          merged.get(b - i * BucketSec))
        if (base.size < Trailing) None
        else {
          val n = merged(b)
          val mean = base.sum.toDouble / Trailing
          val variance = base.map(x => x.toDouble * x).sum / Trailing -
            mean * mean
          val std = math.sqrt(variance)
          if (std <= 0) None
          else {
            val z = math.round((n - mean) / std * 1e6)
            if (math.abs(z) >= (MinZ * 1e6).toLong)
              Some(Anomaly(key, b,
                n, math.round(mean * 100) / 100.0, z))
            else None
          }
        }
      }
      // persist the bounded window: the open bucket + enough history
      // to baseline the NEXT Trailing closes
      val keep = merged.filter { case (b, _) =>
        b >= high - Trailing.toLong * BucketSec
      }
      (known.keySet -- keep.keySet).foreach(buckets.removeKey)
      keep.foreach { case (b, n) =>
        if (!known.get(b).contains(n)) buckets.updateValue(b, n)
      }
      out.iterator
    }
  }

  /** Anomaly stream over raw events with event_type/ts columns.
    * Requires the RocksDB state store provider (transformWithState). */
  def detect(events: DataFrame): Dataset[Anomaly] = {
    implicit val eEnc = Encoders.product[RawEvent]
    implicit val aEnc = Encoders.product[Anomaly]
    implicit val kEnc = Encoders.STRING
    events
      .select(col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))
      .as[RawEvent]
      .groupByKey(_.event_type)
      .transformWithState(new AnomalyProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
