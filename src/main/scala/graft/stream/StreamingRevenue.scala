package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ops.{Aggregations, Cleansing}

/** The reference's streaming job (streaming_sales_aggregator.py) as a
  * source-pluggable Structured Streaming pipeline:
  *
  *   source → from_json(EventSchema) flatten → cleanse (P2,P4-P9,P12) →
  *   watermark 15 min (T1) → 1 h/15 min sliding-window sum (T2/A3) →
  *   append-mode parquet sink, 30 s processing-time trigger (T3-T5).
  *
  * The transform stages are plain `DataFrame => DataFrame` so the same
  * code runs on a Kafka stream, a file stream, a MemoryStream in tests,
  * or a static batch frame (Structured Streaming's unified semantics) —
  * the offline environment has no Kafka connector jar, so tests drive
  * the pipeline with MemoryStream and the Kafka path stays config-only
  * (SURVEY.md §2.6 T8: the connector fail-fast check becomes
  * `validateKafkaAvailable`).
  */
object StreamingRevenue {

  /** Default tuning, mirroring the reference's env knobs. */
  val WatermarkDelay = "15 minutes"
  val WindowDuration = "1 hour"
  val SlideDuration = "15 minutes"
  val DefaultTrigger = "30 seconds"

  /** The exact option set `kafkaSource` hands the connector — factored
    * out so the offline contract test can pin the config (the only part
    * of the Kafka path that can be verified without the connector jar;
    * `kafkaSource` itself fails fast at provider lookup, which the same
    * test asserts). */
  def kafkaSourceOptions(bootstrapServers: String, topic: String,
                         startingOffsets: String = "latest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false")

  /** S4: Kafka source plan (requires the Kafka connector on the
    * classpath at runtime — absent in this offline environment). */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String, startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topic, startingOffsets))
      .load()

  /** T8: fail fast if the Kafka source provider is not on the classpath
    * (the reference resolves connector jars at launch; with a compiled
    * classpath this reduces to a loadability check). */
  def validateKafkaAvailable(): Boolean =
    try {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** File-based event source: stream JSON event files from a directory
    * against the fixed permissive schema — the connector-free deployment
    * path (and the standard landing-zone pattern: producers drop files,
    * the query discovers them incrementally via file listing + the
    * checkpoint's seen-files log). */
  def fileJsonSource(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(EventSchema.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** S5: decode a Kafka-shaped frame (binary `value` column) into the
    * flat 12-string-column event frame. */
  def decodeJson(raw: DataFrame): DataFrame =
    raw.select(
        from_json(col("value").cast("string"), EventSchema.schema).as("event"))
      .select(col("event.*"))

  /** P2, P4-P9, P12: shared with the batch layer (same cleansing code —
    * Structured Streaming runs identical expressions incrementally). */
  def transformOrders(events: DataFrame): DataFrame =
    Cleansing.cleanseStream(events)

  /** T1-T3/A3: watermarked sliding-window revenue with the reference's
    * output schema `(product, revenue, window_start, window_end)`
    * (streaming_sales_aggregator.py:278-285). State is bounded by the
    * watermark; in append mode a (window, product) row is emitted
    * exactly once, when the watermark passes window_end. */
  def aggregate(cleansed: DataFrame,
                watermark: String = WatermarkDelay,
                window: String = WindowDuration,
                slide: String = SlideDuration): DataFrame =
    cleansed
      .withWatermark("order_ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("order_ts"), window, slide)
          .as("time_window"),
        col("product"))
      .agg(round(sum(col("line_amount")), 2).as("revenue"))
      .select(
        col("product"),
        col("revenue"),
        col("time_window").getField("start").as("window_start"),
        col("time_window").getField("end").as("window_end"))

  /** Full pipeline from a raw (string-columned) event frame. */
  def pipeline(events: DataFrame): DataFrame =
    aggregate(transformOrders(events))

  /** Watermarked stream-stream inner join: match each left event to
    * right events with the same key whose event time falls in
    * [left.ts - lookback, left.ts] — e.g. purchases joined to the
    * signup that preceded them within an attribution window.
    *
    * Both sides carry watermarks and the join condition bounds the
    * event-time distance, so Spark derives a state watermark for each
    * side and EVICTS buffered rows once they can no longer match —
    * without the time bound the join state grows forever, which is the
    * difference between a runnable and an OOMing stream at corpus
    * scale. State is keyed on the join key (one shuffle per side);
    * output rows appear once both matching events have arrived. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       key: String, leftTs: String, rightTs: String,
                       lookback: String = "1 hour",
                       leftWatermark: String = WatermarkDelay,
                       rightWatermark: String = WatermarkDelay): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark).as("l")
    val r = right.withWatermark(rightTs, rightWatermark).as("r")
    // resolve key/ts columns against each side's own plan (l(key), not
    // col(s"l.$key")) so names containing dots or other parse-sensitive
    // characters bind correctly; per-side watermark delays let a slow
    // dimension stream lag the fact stream without inflating both states
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs))
  }

  /** Stream-static enrichment: join the (streaming) cleansed events with
    * a static dimension table, broadcast so every micro-batch probes an
    * in-memory map instead of shuffling the stream. Spark re-plans the
    * static side per batch, so slowly-refreshed dims (a re-read parquet)
    * pick up updates between batches. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** S8/T3-T5: append-mode parquet sink with checkpointing and a
    * processing-time trigger. Caller invokes `.start()`. */
  def sink(aggregated: DataFrame, outPath: String, checkpointPath: String,
           triggerInterval: String = DefaultTrigger): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime(triggerInterval))

  /** foreachBatch sink with idempotent batch-directory writes — the
    * production pattern when the target needs transactional or
    * arbitrary-API writes (JDBC upserts, external stores) that the
    * built-in file sink cannot express. Each micro-batch lands in a
    * `batch_id=<id>` partition directory with mode=overwrite: a batch
    * re-delivered after a failure between the write and the checkpoint
    * commit OVERWRITES its own directory instead of appending
    * duplicates, which is what makes retries idempotent (the
    * foreachBatch contract: the batchId is stable across redeliveries).
    * Readers get the union via partition discovery on outPath. Update
    * mode: each batch carries only the (window, product) rows that
    * changed, so directories stay small and late refinements land in
    * later batch dirs. */
  def sinkForeachBatchParquet(aggregated: DataFrame, outPath: String,
                              checkpointPath: String): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        writeBatch(outPath)(batch, batchId)
      }
      .option("checkpointLocation", checkpointPath)

  /** The per-batch writer behind `sinkForeachBatchParquet`, exposed so
    * the idempotency contract is directly testable: writing the SAME
    * batchId twice must leave one copy (mode=overwrite per batch
    * directory), which is what makes checkpoint-redelivery safe. */
  def writeBatch(outPath: String)(batch: org.apache.spark.sql.Dataset[Row],
                                  batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** Incremental-batch variant: process everything available, then stop
    * (Trigger.AvailableNow) — the scheduled-job deployment mode: each
    * run drains the backlog with streaming exactly-once semantics and
    * exits, no long-running cluster needed. */
  def sinkAvailableNow(aggregated: DataFrame, outPath: String,
                       checkpointPath: String): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
}
