package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming sessionization with `flatMapGroupsWithState`: the
  * custom-state counterpart of the batch gap-sessionizer (SparkEntry
  * q32). Events are grouped by user; a session closes when the
  * event-time gap exceeds `gapSeconds` (next event starts a new one) or
  * when the group sees no data past the processing-time timeout.
  *
  * State per user is one running session (bounded); closed sessions are
  * emitted downstream — the update pattern the reference never needed
  * but any session-analytics pipeline does (SURVEY.md §2.6 notes the
  * gap).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long,
                           session_value: Double)

  /** Pure session-fold logic, shared by the streaming operator and unit
    * tests: feed sorted event epochs through the running state, emitting
    * closed sessions. Bounds merge with min/max, not assignment: a LATE
    * event admitted within the watermark delay arrives in a later batch
    * with an epoch at or before the running session's end — assigning
    * `end = ep` would regress the session backward (end < start,
    * spurious gap splits, premature timer flushes).
    *
    * Merge bound: ANY event at or before the running end is absorbed
    * into the session regardless of its distance from `start` — the
    * guard is on the gap past `end` only. A late event more than
    * `gapSeconds` before `start` (which strict batch re-sessionization
    * would place in its own earlier session) therefore widens the
    * running session instead; the watermark delay bounds how late such
    * an event can be, so the divergence from batch semantics is capped
    * at the watermark and only affects sessions still open when the
    * straggler lands. */
  def fold(events: Seq[(Long, Double)], st: Option[SessionState],
           gapSeconds: Long): (Seq[SessionState], Option[SessionState]) = {
    var closed = List.empty[SessionState]
    var cur = st
    events.sortBy(_._1).foreach { case (ep, v) =>
      cur = cur match {
        case Some(s) if ep - s.end <= gapSeconds =>
          Some(s.copy(start = math.min(s.start, ep),
            end = math.max(s.end, ep), n = s.n + 1, total = s.total + v))
        case Some(s) =>
          closed ::= s
          Some(SessionState(ep, ep, 1, v))
        case None =>
          Some(SessionState(ep, ep, 1, v))
      }
    }
    (closed.reverse, cur)
  }

  /** The shared user_id/ts/value projection into the typed event view. */
  private def typedEvents(events: DataFrame): Dataset[Event] = {
    implicit val eEnc = Encoders.product[Event]
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .as[Event]
  }

  /** Streaming sessionization. Input must have user_id/ts/value columns
    * (cleansed event stream); output is the closed-session table.
    *
    * `idleTimeout = Some("30 minutes")` additionally flushes a user's
    * open session when no data arrives for that long (processing time).
    * Beware: a registered processing-time timeout makes the engine run
    * micro-batches continuously to fire it — deterministic tests (and
    * any processAllAvailable-driven harness) must use the default
    * NoTimeout, where sessions close only via the event-time gap. */
  def sessions(events: DataFrame, gapSeconds: Long = 1800,
               idleTimeout: Option[String] = None): Dataset[Session] = {
    implicit val sEnc = Encoders.product[Session]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val kEnc = Encoders.scalaLong
    val typed = typedEvents(events)
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(uid, s.start, s.end, s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val evs = it.map(e =>
              (e.ts.toInstant.getEpochSecond, e.value)).toSeq
            val (closed, open) = fold(evs, state.getOption, gapSeconds)
            open.foreach { s =>
              state.update(s)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            closed.iterator.map(s =>
              Session(uid, s.start, s.end, s.n, s.total))
          }
      }
  }

  /** The same gap-sessionizer on Spark 4's `transformWithState` API —
    * the successor to `flatMapGroupsWithState` for arbitrary streaming
    * state: typed named state handles (`ValueState`/`ListState`/
    * `MapState`) instead of one opaque blob, per-state TTL, timers
    * decoupled from data arrival, and schema-evolvable state. The
    * session fold itself is the shared `fold` — only the state plumbing
    * differs.
    *
    * Runtime requirement: transformWithState runs ONLY on the RocksDB
    * state store (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the provider any
    * large-state production deployment should already be on, since it
    * spills state off-heap instead of holding it in executor memory. */
  class SessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient protected var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      val evs = rows.map(e => (e.ts.toInstant.getEpochSecond, e.value)).toSeq
      val prev = if (session.exists()) Some(session.get()) else None
      val (closed, open) = fold(evs, prev, gapSeconds)
      open match {
        case Some(s) => session.update(s)
        case None    => session.clear()
      }
      closed.iterator.map(s => Session(uid, s.start, s.end, s.n, s.total))
    }
  }

  /** Streaming sessionization via `transformWithState` — same input and
    * output contract as `sessions`. */
  def sessionsTws(events: DataFrame, gapSeconds: Long = 1800): Dataset[Session] = {
    implicit val sEnc = Encoders.product[Session]
    implicit val kEnc = Encoders.scalaLong
    typedEvents(events)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.None(), OutputMode.Append())
  }

  /** Event-time-timer variant: a user's OPEN session is flushed as soon
    * as the WATERMARK passes its gap deadline — no later event from that
    * user required (the `SessionProcessor` above only closes a session
    * when its user shows up again; an abandoned session would sit in
    * state forever). Each batch re-arms one timer per open session at
    * `end + gap`; `handleExpiredTimer` emits and clears. This is the
    * semantics `flatMapGroupsWithState` could only approximate with
    * processing-time timeouts — event-time timers make the flush
    * deterministic and replayable. */
  final class SessionProcessorWithFlush(gapSeconds: Long)
      extends SessionProcessor(gapSeconds) {

    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      // deadline timers from earlier batches are stale once new events
      // extend the session — re-arm at the new deadline
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      // the base fold/state plumbing is strict (List-backed iterator),
      // so state reflects this batch once it returns
      val out = super.handleInputRows(uid, rows, tv)
      if (session.exists())
        getHandle.registerTimer((session.get().end + gapSeconds) * 1000L)
      out
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      val out = if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator.single(Session(uid, s.start, s.end, s.n, s.total))
      } else Iterator.empty
      out
    }
  }

  /** Streaming sessionization with watermark-driven idle flush. The
    * caller's `ts` column drives both the watermark and the session
    * arithmetic; `delay` is the lateness bound (must be a Spark
    * interval string). */
  def sessionsTwsWithFlush(events: DataFrame, gapSeconds: Long = 1800,
                           delay: String = "10 seconds"): Dataset[Session] = {
    implicit val sEnc = Encoders.product[Session]
    implicit val kEnc = Encoders.scalaLong
    typedEvents(events)
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorWithFlush(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming exact dedup bounded by watermark: drops events whose key
    * reappears within the watermark horizon — Structured Streaming's
    * `dropDuplicatesWithinWatermark`, state auto-expired. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream↔batch horizon-dedup parity probe, as a DETERMINISTIC batch
    * result (registered as the q193 oracle row): a planted one-key
    * scenario runs through a REAL [[dedupWithinWatermark]] streaming
    * query (memory source and sink, fixed batch boundaries — the only
    * thing streaming semantics depend on), its survivors are compared
    * against the batch twin ([[graft.ext.Dedup.dedupWithinHorizon]]),
    * and each planted event comes back as
    * (ep_off, in_stream, in_twin, contract_ok).
    *
    * The scenario pins BOTH halves of the contract
    * (SessionizeSpec proves them; this query turns a violation into a
    * red verify row): events 0 s and 5 s (dup inside the 10 s
    * horizon — second dropped by both paths); 25 s (past the
    * horizon of its predecessor, but streaming state is still live
    * because the watermark lags — STREAM drops, twin keeps: the
    * documented stream ⊆ twin divergence); 100 s (state evicted —
    * both keep). `contract_ok` = in_stream ≤ in_twin per event, plus
    * the first event present in both.
    *
    * Scale note: this is a semantics GATE on a planted fixture, not a
    * data-path operator — the corpus-scale horizon dedup is
    * [[graft.ext.Dedup.dedupWithinHorizon]] (q184); the streaming
    * deployment path is e2e-tested in SessionizeSpec/StreamingSpec. */
  def horizonParityProbe(spark: SparkSession,
                         base: Long = 1735725600L,
                         horizonSec: Long = 10L): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val offsets = Seq(0L, 5L, 25L, 100L)
    val batches = Seq(Seq(0L, 5L), Seq(25L), Seq(100L))
    def tsOf(off: Long) = new java.sql.Timestamp((base + off) * 1000L)
    // a 4-row planted stream on the caller's shuffle-partition count
    // pays state-store init × partitions × microbatch (measured 11 s
    // of a 1.5 s probe at local[32]); an isolated session pins the
    // stream's state to ONE partition without touching caller conf
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "1")
    val input = MemoryStream[(Long, java.sql.Timestamp)](ss)
    val name = s"graft_hz_parity_${java.lang.System.nanoTime()}"
    val q = dedupWithinWatermark(
        input.toDF().toDF("k", "ts"), Seq("k"),
        watermark = s"$horizonSec seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    val streamed =
      try {
        batches.foreach { b =>
          input.addData(b.map(off => (1L, tsOf(off))))
          q.processAllAvailable()
        }
        ss.table(name).collect()
          .map(_.getTimestamp(1).getTime / 1000L - base).toSet
      } finally {
        q.stop()
        ss.catalog.dropTempView(name)
      }
    val planted = offsets.map(off => (1L, base + off)).toDF("k", "ep")
    val twin = graft.ext.Dedup
      .dedupWithinHorizon(planted, Seq("k"), "ep", horizonSec)
      .collect().map(_.getLong(1) - base).toSet
    offsets.map { off =>
      val inS = if (streamed(off)) 1L else 0L
      val inT = if (twin(off)) 1L else 0L
      val ok = (inS <= inT) && (off != offsets.head || (inS == 1L && inT == 1L))
      (off, inS, inT, if (ok) 1L else 0L)
    }.toDF("ep_off", "in_stream", "in_twin", "contract_ok")
      .orderBy(col("ep_off"))
  }
}
