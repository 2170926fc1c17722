package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.{EventSchema, StreamingRevenue}

/** T1-T5 streaming semantics, driven synchronously by MemoryStream (no
  * Kafka in this environment; event time is always explicit, never
  * wall-clock, so watermark behavior is deterministic).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runPipeline(batches: Seq[Seq[String]]): Seq[(String, Double, Long)] = {
    val input = MemoryStream[String](spark)
    val raw = input.toDF().select(col("value"))
    val events = StreamingRevenue.decodeJson(
      raw.select(col("value").cast("binary").as("value")))
    val agg = StreamingRevenue.pipeline(events)
    val name = s"stream_out_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .select(col("product"), col("revenue"),
        unix_timestamp(col("window_start")).as("ws"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  private def ev(time: String, product: String, total: String): String =
    s"""{"event_time":"$time","product":"$product","total_price":"$total"}"""

  test("append mode emits a window only after the watermark passes it; late data dropped") {
    val out = runPipeline(Seq(
      // batch 1: two events in the 10:00-10:15 slide region
      Seq(ev("2025-01-01 10:05:00", "A", "10.00"),
          ev("2025-01-01 10:10:00", "A", "5.00")),
      // batch 2: advance event time far enough to close those windows
      // (watermark = max event time - 15 min must pass window_end)
      Seq(ev("2025-01-01 13:00:00", "B", "1.00")),
      // batch 3: a *late* event for the already-closed windows → dropped
      Seq(ev("2025-01-01 10:06:00", "A", "100.00")),
      // batch 4: advance even further so nothing else closes around it
      Seq(ev("2025-01-01 16:00:00", "C", "1.00"))))
    // the 4 sliding windows containing 10:05/10:10 all sum to 15.0
    val aRows = out.filter(_._1 == "A")
    assert(aRows.length === 4)
    assert(aRows.forall(_._2 === 15.0))
    // the late 100.00 never appears (no window with revenue 115 or 100)
    assert(!out.exists(r => r._2 === 115.0 || r._2 === 100.0))
  }

  test("EventSchema decodes all 12 fields with missing keys as null") {
    val df = Seq("""{"product":"X","quantity":"2"}""").toDF("value")
    val flat = StreamingRevenue.decodeJson(
      df.select(col("value").cast("binary").as("value")))
    assert(flat.columns.toSeq === EventSchema.fields)
    val r = flat.collect().head
    assert(r.getAs[String]("product") === "X")
    assert(r.getAs[String]("unit_price") === null)
  }

  test("T5: ProcessingTime trigger commits micro-batches on the interval clock") {
    val input = MemoryStream[String](spark)
    val events = StreamingRevenue.decodeJson(
      input.toDF().select(col("value").cast("binary").as("value")))
    val agg = StreamingRevenue.pipeline(events)
    val out = java.nio.file.Files.createTempDirectory("pt_out").toString + "/agg"
    val ckpt = java.nio.file.Files.createTempDirectory("pt_ckpt").toString
    // the production sink: ProcessingTime trigger (here 50 ms so the test
    // doesn't sleep through the reference's 30 s default) + checkpoint
    val q = StreamingRevenue.sink(agg, out, ckpt, "50 milliseconds").start()
    try {
      input.addData(Seq(ev("2025-01-01 10:05:00", "A", "10.00")))
      q.processAllAvailable()
      // advance event time so A's windows close and rows commit
      input.addData(Seq(ev("2025-01-01 13:00:00", "B", "1.00")))
      q.processAllAvailable()
      assert(q.recentProgress.nonEmpty, "no micro-batch committed")
      assert(q.recentProgress.map(_.numInputRows).sum >= 2)
    } finally q.stop()
    assert(spark.read.parquet(out).count() === 4) // A's 4 sliding windows
  }

  test("corrupt JSON events survive the stream: decode to null, cleanse drops them") {
    val input = MemoryStream[String](spark)
    val events = StreamingRevenue.decodeJson(
      input.toDF().select(col("value").cast("binary").as("value")))
    val agg = StreamingRevenue.pipeline(events)
    val name = s"corrupt_out_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(Seq(
        ev("2025-01-01 10:05:00", "A", "10.00"),
        "{not json at all",
        """{"event_time":"garbage-ts","product":"B","total_price":"1"}""",
        ""))
      q.processAllAvailable()
      // close A's windows; the query must still be alive to process this
      input.addData(Seq(ev("2025-01-01 13:00:00", "C", "2.00")))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
    } finally q.stop()
    val products = spark.table(name).select("product")
      .collect().map(_.getString(0)).toSet
    assert(products === Set("A")) // corrupt + unparseable-ts rows dropped
  }

  test("kafka availability check reports absence in this offline env") {
    assert(!StreamingRevenue.validateKafkaAvailable())
  }

  test("stream-stream interval join matches within lookback and evicts state") {
    import java.sql.Timestamp
    val purchases = MemoryStream[(Long, Timestamp, Double)](spark)
    val signups = MemoryStream[(Long, Timestamp)](spark)
    val p = purchases.toDF().toDF("user_id", "p_ts", "amount")
    val s = signups.toDF().toDF("s_user", "s_ts")
    val joined = StreamingRevenue.streamStreamJoin(
      p, s.withColumnRenamed("s_user", "user_id"),
      "user_id", "p_ts", "s_ts", lookback = "1 hour",
      leftWatermark = "10 minutes", rightWatermark = "10 minutes")
      .select(col("l.user_id"), col("amount"),
        unix_timestamp(col("s_ts")).as("s_epoch"))
    // BOTH sides must carry event-time watermarks: with the interval
    // condition they bound the join state (eviction); dropping them is
    // legal for an append-mode inner join and produces the same rows
    // here, so only this structural check catches the unbounded-state
    // regression
    val watermarkNodes = joined.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }
    assert(watermarkNodes.size === 2,
      s"expected watermarks on both join sides, got ${watermarkNodes.size}")
    val name = s"ssj_out_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    def ts(m: String) = Timestamp.valueOf(s"2025-01-01 $m:00")
    try {
      // signup at 10:00; purchases at 10:30 (in window) and 12:30 (outside)
      signups.addData(Seq((1L, ts("10:00")), (2L, ts("10:05"))))
      purchases.addData(Seq((1L, ts("10:30"), 5.0), (1L, ts("12:30"), 7.0)))
      q.processAllAvailable()
      // later events move the watermark forward so buffered state from
      // the first batch becomes evictable (inner-join rows themselves
      // emit without waiting on the watermark)
      signups.addData(Seq((99L, ts("18:00"))))
      purchases.addData(Seq((99L, ts("18:00"), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    // only the 10:30 purchase joins (12:30 is > 1h after the signup);
    // user 2 never purchases
    assert(rows.toSeq === Seq((5.0, ts("10:00").getTime / 1000)))
  }

  test("foreachBatch sink writes idempotent batch_id directories") {
    val input = MemoryStream[String](spark)
    val events = StreamingRevenue.decodeJson(
      input.toDF().select(col("value").cast("binary").as("value")))
    val agg = StreamingRevenue.pipeline(events)
    val out = java.nio.file.Files.createTempDirectory("fb_out").toString + "/agg"
    val ckpt = java.nio.file.Files.createTempDirectory("fb_ckpt").toString
    val q = StreamingRevenue.sinkForeachBatchParquet(agg, out, ckpt).start()
    try {
      input.addData(Seq(ev("2025-01-01 10:05:00", "A", "10.00")))
      q.processAllAvailable()
      input.addData(Seq(ev("2025-01-01 13:00:00", "B", "1.00")))
      q.processAllAvailable()
    } finally q.stop()
    // partition discovery reads the union of all batch directories;
    // update mode emits A's refined windows as they arrive
    val rows = spark.read.parquet(out)
    assert(rows.columns.contains("batch_id"))
    val byProduct = rows.groupBy("product").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byProduct("A") === 4L) // 4 sliding windows
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(dirs.size >= 1)
    // the idempotency contract itself: REDELIVER an already-written
    // batch id through the same writer — the row count must not grow
    // (mode=overwrite per batch directory; append would duplicate)
    val firstId = dirs.head.stripPrefix("batch_id=").toLong
    val orig = spark.read.parquet(s"$out/batch_id=$firstId")
    // collect + re-create: overwriting a path that the plan also reads
    // is rejected at analysis, and a real redelivery recomputes the
    // batch from the source anyway
    val redelivered = spark.createDataFrame(
      spark.sparkContext.parallelize(orig.collect().toSeq), orig.schema)
    val before = spark.read.parquet(out).count()
    StreamingRevenue.writeBatch(out)(redelivered, firstId)
    assert(spark.read.parquet(out).count() === before,
      "redelivered batch duplicated rows instead of overwriting")
  }

  test("kafka source contract: options pinned, fail-fast without the jar, " +
       "wire shape feeds the pipeline") {
    // the exact option set the connector would receive
    val opts = StreamingRevenue.kafkaSourceOptions("broker:9092", "sales")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "sales",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false"))
    assert(StreamingRevenue
      .kafkaSourceOptions("b", "t", startingOffsets = "earliest")("startingOffsets")
      === "earliest")
    // without the connector jar the source must fail at plan time
    // (provider lookup), not silently at runtime
    val err = intercept[Exception] {
      StreamingRevenue.kafkaSource(spark, "broker:9092", "sales")
    }
    assert(err.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure mode: ${err.getMessage}")
    // a Kafka-wire-shaped frame (binary key/value + topic metadata, the
    // connector's fixed output schema) must flow through decodeJson →
    // cleanse → aggregate: proves the downstream plan binds to the
    // connector's schema even though the connector itself can't load
    val wire = Seq((
      Array[Byte](),
      ev("2024-01-01 10:00:00", "A", "7.00").getBytes("UTF-8"),
      "sales", 0, 0L, new java.sql.Timestamp(0L), 0))
      .toDF("key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType")
    val out = StreamingRevenue.aggregate(
      StreamingRevenue.transformOrders(StreamingRevenue.decodeJson(wire)))
    assert(out.columns.toSeq ===
      Seq("product", "revenue", "window_start", "window_end"))
    val rows = out.collect()
    assert(rows.length >= 1 && rows.forall(_.getString(0) == "A"))
  }

  test("file JSON source + AvailableNow trigger drains the backlog and stops") {
    val dir = java.nio.file.Files.createTempDirectory("evdir").toString
    val out = java.nio.file.Files.createTempDirectory("evout").toString + "/agg"
    val ckpt = java.nio.file.Files.createTempDirectory("evckpt").toString
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$dir/$name")
      lines.foreach(w.println); w.close()
    }
    writeFile("b1.json", Seq(
      ev("2025-01-01 10:05:00", "A", "10.00"),
      ev("2025-01-01 13:00:00", "B", "1.00")))
    val agg = StreamingRevenue.pipeline(
      StreamingRevenue.fileJsonSource(spark, dir))
    val q = StreamingRevenue.sinkAvailableNow(agg, out, ckpt).start()
    q.awaitTermination(60000)
    assert(!q.isActive) // AvailableNow stops after draining
    // A's 4 windows closed by B's 13:00 event advancing the watermark
    val rows = spark.read.parquet(out)
      .select("product", "revenue").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.count(_._1 == "A") === 4)
    assert(rows.filter(_._1 == "A").forall(_._2 === 10.0))
  }

  test("stream-static dim enrichment joins each micro-batch via broadcast") {
    val input = MemoryStream[String](spark)
    val events = StreamingRevenue.decodeJson(
      input.toDF().select(col("value").cast("binary").as("value")))
    val dim = Seq(("A", "beverages"), ("B", "bakery"))
      .toDF("dim_product", "category")
    val enriched = StreamingRevenue.enrichWithDim(
      StreamingRevenue.transformOrders(events), dim, "product", "dim_product")
    val name = s"enrich_${System.nanoTime()}"
    val q = enriched
      .select(col("product"), col("category"), col("line_amount"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(Seq(
        ev("2025-01-01 10:00:00", "A", "5.00"),
        ev("2025-01-01 10:01:00", "C", "1.00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("A") === "beverages")
    assert(out("C") === null) // left join keeps unmatched stream rows
  }

  test("streaming curation: cross-batch dedup via the fingerprint store, restart-idempotent") {
    import graft.stream.CurationStream
    val base = java.nio.file.Files.createTempDirectory("curation").toString
    val (store, out, ckpt) = (s"$base/store", s"$base/out", s"$base/ckpt")

    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CurationStream.sinkCurated(docs, store, out, ckpt).start()
    val batch1 = Seq(
      (1L, "alpha text"), (2L, "beta text"),
      (3L, "alpha text"),              // in-batch duplicate of 1
      (6L, "   "))                     // cleansed away (blank after trim)
    val batch2 = Seq(
      (4L, "Alpha TEXT"),              // cross-batch dup of 1 AFTER folding
      (5L, "gamma text"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    def admitted(): Set[Long] =
      spark.read.option("basePath", out).parquet(out)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // in-batch dup 3 lost to min-id 1; cross-batch dup 4 dropped by the
    // store; blank 6 cleansed — each duplicate dropped exactly once
    assert(admitted() === Set(1L, 2L, 5L))

    // redelivery: replay batch 1's rows under its original batchId with
    // the store already populated — the batch_id exclusion must
    // recompute the SAME survivors, not annihilate them
    CurationStream.processBatch(store, out)(
      batch1.toDF("doc_id", "text"), 0L)
    assert(admitted() === Set(1L, 2L, 5L))
    val storeHashes = spark.read.option("basePath", store).parquet(store)
      .select(col("text_hash")).collect().map(_.getString(0)).toSeq
    assert(storeHashes.size === storeHashes.distinct.size,
      "redelivery duplicated store fingerprints")
    assert(storeHashes.size === 3) // alpha, beta, gamma
  }

  test("ingestion dedup catches a mutated retry the content store cannot") {
    import graft.stream.CurationStream
    val base = java.nio.file.Files.createTempDirectory("ingdedup").toString
    val (store, out, ckpt) = (s"$base/store", s"$base/out", s"$base/ckpt")

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    // the composition under test: id-keyed watermark dedup feeding the
    // content-keyed store pipeline
    val q = CurationStream.sinkCurated(
      CurationStream.dedupIngest(docs).drop("ts"), store, out, ckpt).start()
    try {
      input.addData(Seq(
        (1L, ts("2025-01-01 10:00:00"), "alpha text"),
        // producer retry of doc 1 with an EDITED payload: different
        // content hash, so the fingerprint store would admit it — only
        // the id-keyed ingestion dedup drops it
        (1L, ts("2025-01-01 10:00:03"), "alpha text v2"),
        (2L, ts("2025-01-01 10:00:10"), "beta text")))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.option("basePath", out).parquet(out)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(admitted.keySet === Set(1L, 2L))
    assert(admitted(1L) === "alpha text") // the first delivery won
  }
}
