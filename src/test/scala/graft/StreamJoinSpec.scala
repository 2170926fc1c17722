package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.StreamJoin

/** Stream-stream interval join (view → conversion) and the per-key
  * admission quota — parity with their batch twins, watermark
  * eviction, and cross-batch quota state. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // base offset: an event at exactly epoch 0 collides with the
  // engine's INITIAL watermark (also 0) and is dropped as late —
  // keep every fixture time strictly above it
  private def ts(min: Long): Timestamp =
    new Timestamp((1000L + min) * 60000L)

  // (event_id, ts, user_id, event_type, value) — ordered so the
  // batch-1 cut (first 4) keeps the watermark BELOW every batch-2
  // event time (the t20 straggler would otherwise drag the watermark
  // to exactly t10, a drop-boundary the engine may round either way)
  private val evRows = Seq(
    (1L, ts(0), 7L, "view", 0.0),
    (2L, ts(5), 7L, "purchase", 42.0),   // converts (5 min lag)
    (4L, ts(1), 8L, "view", 0.0),
    (5L, ts(2), 9L, "purchase", 5.0),    // purchase with no view
    (6L, ts(3), 8L, "view", 0.0),        // second view, same user
    (7L, ts(10), 8L, "purchase", 7.0),   // converts BOTH user-8 views
    (3L, ts(20), 7L, "purchase", 9.0))   // outside the 15-min horizon

  private def evDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("stream-stream conversion join equals the batch twin") {
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val got = StreamJoin.conversions(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      horizonSeconds = 900, delay = "10 minutes")
    val q = got.writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    // two arbitrary batch cuts
    stream.addData(evRows.take(4): _*)
    q.processAllAvailable()
    stream.addData(evRows.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("user_id"), col("lag_seconds"), col("value"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val want = canon(StreamJoin.conversionsBatch(evDf(evRows), 900))
    assert(want === Seq((7L, 300L, 42.0), (8L, 420L, 7.0),
      (8L, 540L, 7.0)))
    assert(canon(spark.table("conv")) === want)
  }

  test("a purchase older than the watermark horizon never joins") {
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val got = StreamJoin.conversions(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      horizonSeconds = 900, delay = "10 minutes")
    val q = got.writeStream.format("memory").queryName("conv_late")
      .outputMode("append").start()
    // batch 1: a view at t0 plus traffic at t+60min on BOTH event
    // types — the global watermark is the MIN across the two
    // watermarked sides, so filler views alone would leave the
    // purchase side's watermark (and the join state eviction) at zero
    stream.addData((1L, ts(0), 7L, "view", 0.0),
      (2L, ts(60), 98L, "view", 0.0),
      (3L, ts(60), 99L, "purchase", 1.0))
    q.processAllAvailable()
    // batch 2: more two-sided filler — the watermark computed from
    // batch 1 only takes effect in the NEXT micro-batch, so this one
    // forces the commit (the engine's one-batch watermark lag)
    stream.addData((5L, ts(61), 98L, "view", 0.0),
      (6L, ts(61), 99L, "purchase", 1.0))
    q.processAllAvailable()
    // batch 3: a purchase back at t+5min — its event time is far
    // behind the watermark (t+50min), so the view's buffered state is
    // already evicted and nothing joins
    stream.addData((9L, ts(5), 7L, "purchase", 42.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("conv_late").count() === 0L)
  }

  test("quotaAdmit: first k per (source, window), state spans batches") {
    val stream = MemoryStream[(Long, String, Timestamp)](spark)
    val got = StreamJoin.quotaAdmit(
      stream.toDF().toDF("doc_id", "source", "ts"),
      k = 2L, windowSeconds = 900)
    val q = got.writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    // batch 1: three docs in src-a window 0 (one must be dropped),
    // one in src-b
    stream.addData((1L, "a", ts(1)), (2L, "a", ts(2)), (3L, "a", ts(3)),
      (10L, "b", ts(1)))
    q.processAllAvailable()
    // batch 2: src-a window 0 is FULL (cross-batch state); the next
    // window admits again
    stream.addData((4L, "a", ts(4)), (5L, "a", ts(20)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("quota")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // window starts: ts(1..4) land in the 900 s bucket at 59400;
    // ts(20) = 61200 starts its own
    val (w0, w1) = (59400L, 61200L)
    assert(rows === Set(
      (1L, "a", w0, 1L), (2L, "a", w0, 2L),   // 3 dropped (k = 2)
      (10L, "b", w0, 1L),
      (5L, "a", w1, 1L)))                      // 4 dropped, next window admits
    // parity with the batch twin ON COUNTS: min(k, n) per key
    val admittedCounts = spark.table("quota")
      .groupBy("source", "window_start").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(admittedCounts === Map(("a", w0) -> 2L, ("b", w0) -> 1L,
      ("a", w1) -> 1L))
  }

  test("quotaAdmitTws matches the flatMapGroupsWithState semantics") {
    // transformWithState runs only on the RocksDB state store
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, String, Timestamp)](spark)
      val name = s"quota_tws_${System.nanoTime()}"
      val q = StreamJoin.quotaAdmitTws(
        stream.toDF().toDF("doc_id", "source", "ts"),
        k = 2L, windowSeconds = 900)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData((1L, "a", ts(1)), (2L, "a", ts(2)),
          (3L, "a", ts(3)), (10L, "b", ts(1)))
        q.processAllAvailable()
        stream.addData((4L, "a", ts(4)), (5L, "a", ts(20)))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      // identical decision set as the fMGWS variant above
      assert(rows === Set(
        (1L, "a", 59400L, 1L), (2L, "a", 59400L, 2L),
        (10L, "b", 59400L, 1L), (5L, "a", 61200L, 1L)))
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
