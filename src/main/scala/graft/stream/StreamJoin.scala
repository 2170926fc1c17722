package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

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
  /** Pure admission fold shared by both state APIs: given the count
    * already admitted, admit up to the remaining room in (ts, id)
    * order with running ranks. */
  private def admitFold(key: QKey, rows: Iterator[QDoc], already: Long,
                        k: Long): (Seq[Admitted], Long) = {
    val room = math.max(0L, k - already)
    val admitted = rows.toSeq
      .sortBy(d => (d.ts.toInstant.getEpochSecond, d.doc_id))
      .take(math.min(room, Int.MaxValue.toLong).toInt)
    (admitted.zipWithIndex.map { case (d, i) =>
      Admitted(d.doc_id, key.source, key.window_start, already + i + 1)
    }, already + admitted.length)
  }

  private def typedQuota(docs: DataFrame,
                         windowSeconds: Long): Dataset[QDoc] = {
    implicit val qEnc = Encoders.product[QDoc]
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"),
        col("ts").cast("timestamp").as("ts"))
      .as[QDoc]
  }

  private def quotaKey(windowSeconds: Long): QDoc => QKey = d =>
    QKey(d.source,
      d.ts.toInstant.getEpochSecond / windowSeconds * windowSeconds)

  def quotaAdmit(docs: DataFrame, k: Long,
                 windowSeconds: Long = 900): Dataset[Admitted] = {
    implicit val kEnc = Encoders.product[QKey]
    implicit val sEnc = Encoders.product[QuotaState]
    implicit val aEnc = Encoders.product[Admitted]
    require(k > 0 && windowSeconds > 0)
    typedQuota(docs, windowSeconds)
      .groupByKey(quotaKey(windowSeconds))
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: QKey, it: Iterator[QDoc], state: GroupState[QuotaState]) =>
          val (out, total) = admitFold(key, it,
            state.getOption.map(_.admitted).getOrElse(0L), k)
          state.update(QuotaState(total))
          out.iterator
      }
  }

  /** The same admission quota on Spark 4's `transformWithState` — the
    * deployment-grade variant: typed named state on the RocksDB
    * provider (state spills off-heap) and per-state TTL available for
    * closed-window counter expiry (`TTLConfig` — the config knob the
    * fMGWS version documents as a deployment choice). Same admission
    * semantics via the shared [[admitFold]]. */
  class QuotaProcessor(k: Long)
      extends StatefulProcessor[QKey, QDoc, Admitted] {
    @transient private var cnt: ValueState[QuotaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[QuotaState]("admitted",
        Encoders.product[QuotaState], TTLConfig.NONE)

    override def handleInputRows(key: QKey, rows: Iterator[QDoc],
                                 tv: TimerValues): Iterator[Admitted] = {
      val already = if (cnt.exists()) cnt.get().admitted else 0L
      val (out, total) = admitFold(key, rows, already, k)
      cnt.update(QuotaState(total))
      out.iterator
    }
  }

  /** [[quotaAdmit]] via `transformWithState` (RocksDB state store
    * required — the same runtime note as `Sessionize.sessionsTws`). */
  def quotaAdmitTws(docs: DataFrame, k: Long,
                    windowSeconds: Long = 900): Dataset[Admitted] = {
    implicit val kEnc = Encoders.product[QKey]
    implicit val aEnc = Encoders.product[Admitted]
    require(k > 0 && windowSeconds > 0)
    typedQuota(docs, windowSeconds)
      .groupByKey(quotaKey(windowSeconds))
      .transformWithState(new QuotaProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
