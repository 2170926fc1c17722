package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamingAnomaly

/** The streaming anomaly detector's oracle is the batch operator: an
  * in-order dense replay must reproduce `Behavior.rateAnomaly`'s rows
  * exactly (same counts → same baseline math → same z). */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000L - (1700000000L % 900)

  /** (event_type, ts) rows: buckets 0-9 alternate 10/11 events, bucket
    * 10 spikes to 30, bucket 11 (10 events) closes the spike bucket. */
  private def rows(buckets: Range): Seq[(String, Timestamp)] =
    buckets.flatMap { b =>
      val n = if (b == 10) 30 else if (b % 2 == 0) 10 else 11
      (0 until n).map(_ =>
        ("click", new Timestamp((base + b * 900) * 1000L)))
    }

  test("in-order replay reproduces the batch rateAnomaly rows exactly") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Timestamp)](spark)
      val df = input.toDF().toDF("event_type", "ts")
      val name = s"anomalies_${System.nanoTime()}"
      val q = StreamingAnomaly.detect(df)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(rows(0 until 6))   // closes 0-4 (baselines short)
        q.processAllAvailable()
        input.addData(rows(6 to 10))     // closes 5-9 (8,9 scored, |z|<2)
        q.processAllAvailable()
        input.addData(rows(11 to 11))    // closes the spike bucket
        q.processAllAvailable()
        // a late row for a long-closed bucket must not re-emit anything
        input.addData(Seq(("click", new Timestamp((base + 1 * 900) * 1000L))))
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
      val batch = graft.ops.Behavior.rateAnomaly(
          rows(0 to 11).toDF("event_type", "ts")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
      assert(batch.nonEmpty) // the spike must actually trip the batch op
      assert(streamed === batch)
      // and it is the spike bucket, scored against the pre-spike baseline
      val row = streamed.head
      assert(row._2 === base + 10 * 900)
      assert(row._3 === 30L)
      assert(row._5 === ((30 - 10.5) / 0.5 * 1e6).toLong)
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
