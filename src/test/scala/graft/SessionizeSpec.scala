package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.stream.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("fold closes sessions on gap and keeps the running one open") {
    val (closed, open) = Sessionize.fold(
      Seq((100L, 1.0), (200L, 2.0), (5000L, 3.0)), None, gapSeconds = 1800)
    assert(closed === Seq(Sessionize.SessionState(100, 200, 2, 3.0)))
    assert(open === Some(Sessionize.SessionState(5000, 5000, 1, 3.0)))
  }

  test("fold never regresses session bounds on late (out-of-order) events") {
    // a later batch delivers an event older than the running session's
    // end (admitted within the watermark delay): bounds must widen via
    // min/max, never move backward
    val st = Some(Sessionize.SessionState(1000, 2000, 2, 5.0))
    val (closed, open) = Sessionize.fold(
      Seq((1500L, 1.0)), st, gapSeconds = 1800)
    assert(closed.isEmpty)
    assert(open === Some(Sessionize.SessionState(1000, 2000, 3, 6.0)))
    // a late event slightly BEFORE the session start widens start too
    val (c2, o2) = Sessionize.fold(Seq((900L, 1.0)), st, gapSeconds = 1800)
    assert(c2.isEmpty && o2 === Some(Sessionize.SessionState(900, 2000, 3, 6.0)))
  }

  test("streaming flatMapGroupsWithState emits closed sessions") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val df = input.toDF().toDF("user_id", "ts", "value")
    val name = s"sessions_${System.nanoTime()}"
    val q = Sessionize.sessions(df, gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(Seq(
        (1L, ts("2025-01-01 10:00:00"), 1.0),
        (1L, ts("2025-01-01 10:10:00"), 2.0)))
      q.processAllAvailable()
      // the big gap closes the first session for user 1
      input.addData(Seq((1L, ts("2025-01-01 14:00:00"), 5.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
      .select("user_id", "n_events", "session_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 3.0)))
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState semantics") {
    // transformWithState runs only on the RocksDB state store
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
      val df = input.toDF().toDF("user_id", "ts", "value")
      val name = s"sessions_tws_${System.nanoTime()}"
      val q = Sessionize.sessionsTws(df, gapSeconds = 1800)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        def ts(s: String) = java.sql.Timestamp.valueOf(s)
        input.addData(Seq(
          (1L, ts("2025-01-01 10:00:00"), 1.0),
          (1L, ts("2025-01-01 10:10:00"), 2.0),
          (2L, ts("2025-01-01 10:00:00"), 7.0)))
        q.processAllAvailable()
        // the big gap closes user 1's session; user 2 stays open
        input.addData(Seq((1L, ts("2025-01-01 14:00:00"), 5.0)))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table(name)
        .select("user_id", "n_events", "session_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, 2L, 3.0)))
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("event-time timer flushes an idle session once the watermark passes") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
      val df = input.toDF().toDF("user_id", "ts", "value")
      val name = s"sessions_flush_${System.nanoTime()}"
      val q = Sessionize.sessionsTwsWithFlush(df, gapSeconds = 1800,
          delay = "10 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        def ts(s: String) = java.sql.Timestamp.valueOf(s)
        input.addData(Seq((1L, ts("2025-01-01 10:00:00"), 1.0)))
        q.processAllAvailable()
        // watermark lags a batch: this one moves it to ~14:59:50...
        input.addData(Seq((2L, ts("2025-01-01 15:00:00"), 7.0)))
        q.processAllAvailable()
        // ...and this batch evaluates timers against it, flushing user
        // 1's abandoned session with NO further user-1 event
        input.addData(Seq((2L, ts("2025-01-01 15:00:01"), 1.0)))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table(name)
        .select("user_id", "n_events", "session_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, 1L, 1.0)))
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streamed sessions roll up to the batch bounceRate exactly") {
    // the streaming sessionizer is the online half of q142: its
    // emitted sessions, aggregated per start day, must reproduce
    // Behavior.bounceRate on the same in-order rows
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // user 1: a 2-event session then a 1-event session (bounce), day 1;
      // user 2: one event (bounce) on day 2
      val rows = Seq(
        (1L, ts("2025-01-01 10:00:00"), 1.0),
        (1L, ts("2025-01-01 10:10:00"), 2.0),
        (1L, ts("2025-01-01 13:00:00"), 3.0),
        (2L, ts("2025-01-02 09:00:00"), 4.0))
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
      val df = input.toDF().toDF("user_id", "ts", "value")
      val name = s"bounce_tws_${System.nanoTime()}"
      val q = Sessionize.sessionsTwsWithFlush(df, gapSeconds = 1800,
          delay = "10 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(rows)
        q.processAllAvailable()
        // sentinel user far in the future advances the watermark; the
        // next batch fires the idle timers and flushes every real
        // session (the sentinel's own session never closes → absent)
        input.addData(Seq((99L, ts("2025-01-05 00:00:00"), 0.0)))
        q.processAllAvailable()
        input.addData(Seq((99L, ts("2025-01-05 00:00:01"), 0.0)))
        q.processAllAvailable()
      } finally q.stop()

      val streamedRollup = spark.table(name)
        .groupBy(expr("session_start div 86400").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .as("n_bounces"))
        .select(col("day"), col("n_sessions"), col("n_bounces"),
          round(col("n_bounces").cast("double") * 100 / col("n_sessions"), 4)
            .as("bounce_pct"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = graft.ops.Behavior.bounceRate(
          rows.zipWithIndex.map { case ((u, t, v), i) => (u, t, i.toLong) }
            .toDF("user_id", "ts", "event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(batch.map(_._1).size === 2)
      assert(streamedRollup === batch)
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("MapState running counters accumulate across micro-batches per entry") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
      val df = input.toDF().toDF("user_id", "ts", "event_type")
      val name = s"counts_${System.nanoTime()}"
      val q = graft.stream.RunningCounts.typeCounts(df)
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
      try {
        def ts(s: String) = java.sql.Timestamp.valueOf(s)
        input.addData(Seq(
          (1L, ts("2025-01-01 10:00:00"), "click"),
          (1L, ts("2025-01-01 10:00:01"), "click"),
          (1L, ts("2025-01-01 10:00:02"), "view")))
        q.processAllAvailable()
        // second batch touches only "click" — its counter continues
        // from stored state, "view" is untouched
        input.addData(Seq((1L, ts("2025-01-01 10:01:00"), "click")))
        q.processAllAvailable()
      } finally q.stop()
      val latest = spark.table(name)
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      assert(latest === Map("click" -> 3L, "view" -> 1L))
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("dropDuplicatesWithinWatermark removes re-sent events in-stream") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val df = input.toDF().toDF("event_id", "ts", "value")
    val name = s"dedup_${System.nanoTime()}"
    val q = Sessionize.dedupWithinWatermark(df, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(Seq(
        (10L, ts("2025-01-01 10:00:00"), 1.0),
        (10L, ts("2025-01-01 10:00:05"), 1.0), // duplicate key
        (11L, ts("2025-01-01 10:01:00"), 2.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table(name).count() === 2)
  }

  test("dropDuplicatesWithinWatermark survivors are a subset of the " +
      "batch twin's (greedy horizon anchors)") {
    // The streaming contract: duplicates closer than the delay NEVER
    // both survive; state may outlive the delay (up to watermark lag),
    // so streaming may drop MORE. The batch twin (dedupWithinHorizon)
    // drops EXACTLY the within-horizon events — so stream-survivors ⊆
    // twin-survivors, and both always keep each key's first event.
    def ts(s: Long) = new java.sql.Timestamp(1735725600000L + s * 1000L)
    val d = 10L // seconds, both the streaming delay and batch horizon
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val name = s"deduptwin_${System.nanoTime()}"
    val q = Sessionize.dedupWithinWatermark(
        input.toDF().toDF("k", "ts", "v"), Seq("k"),
        watermark = s"$d seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(Seq((1L, ts(0), 1.0), (1L, ts(5), 1.0))) // dup < d
      q.processAllAvailable()
      // 25 s: past the horizon of 0, but state for key 1 is still live
      // (watermark −5 s < expiry 10 s) → streaming drops, twin keeps
      input.addData(Seq((1L, ts(25), 1.0)))
      q.processAllAvailable()
      // 100 s: state evicted (watermark 15 s > expiry) → both keep
      input.addData(Seq((1L, ts(100), 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => r.getTimestamp(1).getTime / 1000).toSet
    val batch = Seq((1L, ts(0)), (1L, ts(5)), (1L, ts(25)), (1L, ts(100)))
      .toDF("k", "ts")
      .select(col("k"), (col("ts").cast("long")).as("ep"))
    val twin = graft.ext.Dedup
      .dedupWithinHorizon(batch, Seq("k"), "ep", d)
      .collect().map(_.getLong(1)).toSet
    val base = 1735725600L
    assert(twin === Set(base, base + 25, base + 100)) // 5 s dup dropped
    assert(streamed.subsetOf(twin))
    assert(streamed.contains(base)) // first event survives both paths
  }

  test("horizonParityProbe pins the stream-vs-twin contract as rows") {
    val rows = Sessionize.horizonParityProbe(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (0L, 1L, 1L, 1L),    // first event survives both
      (5L, 0L, 0L, 1L),    // in-horizon dup dropped by both
      (25L, 0L, 1L, 1L),   // still-live state: stream drops, twin keeps
      (100L, 1L, 1L, 1L))) // state evicted: both keep
  }

  test("built-in session_window streams with a watermark and matches batch") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2025-01-01 10:00:00"), 1.0),
      (1L, ts("2025-01-01 10:10:00"), 2.0),  // same session (10 min gap)
      (1L, ts("2025-01-01 11:00:00"), 4.0),  // 50 min gap → new session
      (2L, ts("2025-01-01 10:05:00"), 8.0))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("n"), col("v"))

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val name = s"sesswin_${System.nanoTime()}"
    val q = sessions(input.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      // advance the watermark past every session end to flush state
      input.addData(Seq((9L, ts("2025-01-01 13:00:00"), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .filter(col("user_id") =!= 9L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = sessions(rows.toDF("user_id", "ts", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed === batch)
    assert(batch === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("nearDupPairsBlocked finds in-bucket pairs at a fraction of the scan") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.nearDupPairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.nearDupPairsBlocked(emb, 0.4, nCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact))
    assert(exact.isEmpty || blocked.nonEmpty)
  }
}
