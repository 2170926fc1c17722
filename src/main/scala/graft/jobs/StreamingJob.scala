package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.stream.StreamingRevenue

/** The reference's streaming job
  * (services/streaming/streaming_sales_aggregator.py) as a runnable
  * application: Kafka JSON events → cleanse → watermarked sliding-window
  * revenue → append-mode parquet with checkpointing.
  *
  * Config via environment (the reference's knobs):
  *   KAFKA_BOOTSTRAP_SERVERS (default localhost:9092)
  *   KAFKA_TOPIC             (default sales)
  *   STARTING_OFFSETS        (default latest)
  *   OUTPUT_PATH / CHECKPOINT_DIR
  *   STREAM_TRIGGER_INTERVAL (default 30 seconds)
  *   SPARK_SHUFFLE_PARTITIONS (default 4 — small stateful job)
  *
  * Fails fast when the Kafka connector is not on the classpath (T8).
  */
object StreamingJob {
  def main(args: Array[String]): Unit = {
    val env = sys.env
    val bootstrap = env.getOrElse("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    val topic = env.getOrElse("KAFKA_TOPIC", "sales")
    val offsets = env.getOrElse("STARTING_OFFSETS", "latest")
    val outPath = env.getOrElse("OUTPUT_PATH", "/tmp/graft-stream/agg")
    val ckpt = env.getOrElse("CHECKPOINT_DIR", "/tmp/graft-stream/ckpt")
    val trigger = env.getOrElse("STREAM_TRIGGER_INTERVAL", "30 seconds")
    val shuffle = env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "4")

    if (!StreamingRevenue.validateKafkaAvailable()) {
      System.err.println(
        "[stream] spark-sql-kafka connector not on classpath; aborting")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .appName("graft-streaming-revenue")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val events = StreamingRevenue.decodeJson(
      StreamingRevenue.kafkaSource(spark, bootstrap, topic, offsets))
    val agg = StreamingRevenue.pipeline(events)
    val query = StreamingRevenue.sink(agg, outPath, ckpt, trigger).start()
    query.awaitTermination()
  }
}
