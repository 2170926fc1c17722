package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Stream-STREAM operators over the EVENTS domain:
  *
  *  1. the view → conversion INTERVAL JOIN: the generic
  *     [[StreamingRevenue.streamStreamJoin]] primitive (lookback
  *     window, per-side watermarks) specialised to the conversion
  *     shape — forward horizon instead of lookback, the lag/value
  *     projection, and (new) an ORACLE-CHECKED batch twin
  *     (q277_conversion_join) so the join semantics are pinned
  *     cross-engine, not just spec-asserted. Spark buffers each side
  *     in state; the range condition + BOTH watermarks bound that
  *     buffer (the global watermark is the min across sides — see the
  *     spec's two-sided-filler lesson);
  *  2. a per-key ADMISSION QUOTA (`flatMapGroupsWithState`): admit the
  *     first `k` documents per (source, event-time window), drop the
  *     rest — the ingest rate-limit every crawl pipeline runs in front
  *     of expensive stages (its batch twin is q77's domain quota,
  *     which caps by seeded hash rank; the stream caps by arrival,
  *     so the two agree on admitted COUNTS, not membership).
  */
object StreamJoin {

  /** View→purchase conversion join: each view matched with the SAME
    * user's purchases inside `(view_ts, view_ts + horizonSeconds]`,
    * both sides watermarked by `delay`. Inner join — unconverted views
    * simply never emit (conversion RATE is a downstream aggregate over
    * emitted rows vs the view stream).
    *
    * Scale shape: state holds only rows younger than
    * `delay + horizon` per side (watermark + range condition —
    * Spark's own state eviction, no custom code); the join is
    * key-partitioned on user_id, so the shuffle is the same one the
    * batch twin pays. */
  def conversions(events: DataFrame, horizonSeconds: Long = 900,
                  delay: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("buy_ts"),
        col("value"))
      .withWatermark("buy_ts", delay)
    views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") > col("view_ts") &&
          col("buy_ts") <=
            col("view_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("user_id"), col("view_ts"), col("buy_ts"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("view_ts")))
          .cast("long").as("lag_seconds"),
        col("value"))
  }

  /** Batch twin of [[conversions]] — the SAME projection and join
    * condition without watermarks, for parity specs and backfills. */
  def conversionsBatch(events: DataFrame,
                       horizonSeconds: Long = 900): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("buy_ts"),
        col("value"))
    views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") > col("view_ts") &&
          col("buy_ts") <=
            col("view_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("user_id"), col("view_ts"), col("buy_ts"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("view_ts")))
          .cast("long").as("lag_seconds"),
        col("value"))
  }

  final case class QDoc(doc_id: Long, source: String, ts: Timestamp)
  final case class QKey(source: String, window_start: Long)
  final case class QuotaState(admitted: Long)
  final case class Admitted(doc_id: Long, source: String,
                            window_start: Long, admit_rank: Long)

  /** Per-(source, event-time window) admission quota: the first `k`
    * documents of each key are admitted with their rank, the rest are
    * dropped. Within one micro-batch, "first" is (ts, doc_id) order —
    * deterministic for a fixed batching; across batches it is arrival
    * order, which is the semantics an ingest rate-limit actually wants
    * (the batch q77 twin picks a seeded-hash sample instead, so the
    * two agree on counts, not membership).
    *
    * Scale shape: state is ONE counter per live (source, window) key —
    * bounded by sources × windows-in-flight, never by document count;
    * admission is a single shuffle on the quota key. State for closed
    * windows is dropped once the counter reaches `k` and the window
    * falls behind the watermark horizon a deployment configures on the
    * input; under the default NoTimeout the counters are small enough
    * (16 bytes/key) that explicit TTL is a config choice, not a
    * correctness one. */
  def quotaAdmit(docs: DataFrame, k: Long,
                 windowSeconds: Long = 900): Dataset[Admitted] = {
    implicit val qEnc = Encoders.product[QDoc]
    implicit val kEnc = Encoders.product[QKey]
    implicit val sEnc = Encoders.product[QuotaState]
    implicit val aEnc = Encoders.product[Admitted]
    require(k > 0 && windowSeconds > 0)
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"),
        col("ts").cast("timestamp").as("ts"))
      .as[QDoc]
      .groupByKey(d => QKey(d.source,
        d.ts.toInstant.getEpochSecond / windowSeconds * windowSeconds))
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: QKey, it: Iterator[QDoc], state: GroupState[QuotaState]) =>
          val already = state.getOption.map(_.admitted).getOrElse(0L)
          val room = math.max(0L, k - already)
          val batch = it.toSeq.sortBy(d =>
            (d.ts.toInstant.getEpochSecond, d.doc_id))
          val admitted = batch.take(room.toInt)
          state.update(QuotaState(already + admitted.length))
          admitted.iterator.zipWithIndex.map { case (d, i) =>
            Admitted(d.doc_id, key.source, key.window_start,
              already + i + 1)
          }
      }
  }
}
