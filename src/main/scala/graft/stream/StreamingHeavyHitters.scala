package graft.stream

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-window heavy hitters — the online twin of
  * `Profiling.heavyHitters` (q140): per event-time bucket, a
  * Misra-Gries candidate summary of the hot keys, emitted when the
  * watermark closes the bucket. The "what's trending this quarter-hour"
  * feed, with the same sketch guarantee as the batch op: every key
  * whose true in-bucket frequency exceeds n/capacity IS in the emitted
  * candidate set (MG admits false positives below the threshold, never
  * false negatives above it), and every emitted count is an
  * UNDER-estimate of the true frequency. Downstream consumers recount
  * candidates exactly (the q140 second pass) or threshold on
  * mg_count directly where an undercount is acceptable.
  *
  * Shape: the stream is keyed by a HASH SHARD of the key space (not by
  * time bucket — a bucket key would funnel every in-flight event
  * through one task; not by raw key — per-key state defeats the point
  * of a bounded summary), so each of `nShards` tasks maintains an
  * O(capacity) summary per open bucket. State is
  * O(shards × open buckets × capacity) — independent of key
  * cardinality and event volume, the property that makes the operator
  * safe on an unbounded stream.
  *
  * Merging (the mergeable-summaries property): per-shard undercounts
  * total ≤ n_s/capacity, so summing candidate counts across shards
  * gives a global summary with error ≤ Σ n_s/capacity = n/capacity —
  * and any key with global frequency > n/capacity must exceed its
  * shard's local threshold in at least one shard (else summing the
  * per-shard bounds contradicts the premise), so the UNION of shard
  * candidates contains every global heavy hitter. The spec pins both
  * guarantees against exact batch counts.
  *
  * Late data: a bucket is frozen once its timer fired — rows at or
  * below the shard's closed frontier are dropped (the
  * [[StreamingAnomaly]] frontier discipline: a re-opened bucket would
  * emit a second, partial candidate row for a window downstream
  * consumers already acted on).
  */
object StreamingHeavyHitters {

  final case class KeyedEvent(shard: Int, k: String, bucket: Long,
                              ts: Timestamp)
  final case class Candidate(bucket: Long, shard: Int, k: String,
                             mg_count: Long, n_shard_rows: Long)

  final class HeavyHittersProcessor(capacity: Int, bucketSec: Long)
      extends StatefulProcessor[Int, KeyedEvent, Candidate] {
    @transient private var counters: MapState[(Long, String), Long] = _
    @transient private var rowCounts: MapState[Long, Long] = _
    @transient private var frontier: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[(Long, String), Long]("counters",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING),
        Encoders.scalaLong, TTLConfig.NONE)
      rowCounts = getHandle.getMapState[Long, Long]("rowCounts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      frontier = getHandle.getValueState[Long]("frontier",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[KeyedEvent],
                                 tv: TimerValues): Iterator[Candidate] = {
      val closed = if (frontier.exists()) frontier.get() else Long.MinValue
      // load touched buckets' summaries once per micro-batch, run the
      // exact row-at-a-time MG algorithm locally, write back once
      val local = mutable.Map.empty[Long, mutable.Map[String, Long]]
      val localN = mutable.Map.empty[Long, Long]
      def summary(b: Long): mutable.Map[String, Long] =
        local.getOrElseUpdate(b, {
          val m = mutable.Map.empty[String, Long]
          counters.iterator().foreach { case ((bb, k), c) =>
            if (bb == b) m(k) = c
          }
          localN(b) =
            if (rowCounts.containsKey(b)) rowCounts.getValue(b) else 0L
          m
        })
      rows.foreach { e =>
        if (e.bucket > closed) {
          val m = summary(e.bucket)
          localN(e.bucket) = localN(e.bucket) + 1L
          m.get(e.k) match {
            case Some(c) => m(e.k) = c + 1L
            case None if m.size < capacity => m(e.k) = 1L
            case None =>
              // Misra-Gries decrement step: all counters down one,
              // zeros evicted — O(capacity), amortized O(1) per row
              m.keys.toSeq.foreach { k =>
                val c = m(k) - 1L
                if (c == 0L) m.remove(k) else m(k) = c
              }
          }
        }
      }
      local.foreach { case (b, m) =>
        // evicted keys first (collected before mutating the state map)
        val stale = counters.iterator().collect {
          case (key @ (bb, k), _) if bb == b && !m.contains(k) => key
        }.toVector
        stale.foreach(counters.removeKey)
        m.foreach { case (k, c) => counters.updateValue((b, k), c) }
        rowCounts.updateValue(b, localN(b))
        getHandle.registerTimer((b + 1) * bucketSec * 1000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(shard: Int, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Candidate] = {
      val bucket = info.getExpiryTimeInMs() / 1000L / bucketSec - 1L
      val n =
        if (rowCounts.containsKey(bucket)) rowCounts.getValue(bucket) else 0L
      val out = counters.iterator().collect {
        case ((b, k), c) if b == bucket => Candidate(bucket, shard, k, c, n)
      }.toVector
      out.foreach(c => counters.removeKey((bucket, c.k)))
      rowCounts.removeKey(bucket)
      val closed = if (frontier.exists()) frontier.get() else Long.MinValue
      if (bucket > closed) frontier.update(bucket)
      out.iterator
    }
  }

  /** Heavy-hitter candidate stream over raw events with key/ts columns.
    * Requires the RocksDB state store provider (transformWithState). */
  def heavyHitters(events: DataFrame, capacity: Int = 8, nShards: Int = 4,
                   bucketSec: Long = 900L, delay: String = "10 seconds",
                   keyCol: String = "event_type",
                   tsCol: String = "ts"): Dataset[Candidate] = {
    implicit val kEnc = Encoders.product[KeyedEvent]
    implicit val cEnc = Encoders.product[Candidate]
    implicit val sEnc = Encoders.scalaInt
    implicit val inEnc = Encoders.tuple(Encoders.STRING, Encoders.TIMESTAMP)
    events
      .select(col(keyCol).cast("string"), col(tsCol).cast("timestamp"))
      .as[(String, Timestamp)]
      .map { case (k, t) =>
        KeyedEvent(Math.floorMod(k.hashCode, nShards), k,
          Math.floorDiv(t.getTime / 1000L, bucketSec), t)
      }
      .withWatermark("ts", delay)
      .groupByKey(_.shard)
      .transformWithState(new HeavyHittersProcessor(capacity, bucketSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
