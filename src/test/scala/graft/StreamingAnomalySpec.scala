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

  /** (event_type, ts) rows: buckets 0-9 alternate 10/11 events, buckets
    * 10 and 12 spike to 30, bucket 11 (11 events) closes the first
    * spike and bucket 13 the second. */
  private def rows(buckets: Range): Seq[(String, Timestamp)] =
    buckets.flatMap { b =>
      val n = if (b == 10 || b == 12) 30 else if (b % 2 == 0) 10 else 11
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
        // late rows for a RECENTLY closed bucket (still retained as
        // baseline history) must also be dropped — counts freeze at
        // close. Distinguishing load: 20 late hits on closed bucket 10
        // would inflate bucket 12's baseline std enough to SUPPRESS the
        // second spike (z 2.64 → 1.11) if they were merged; the frozen
        // count keeps the batch-oracle emission
        input.addData((0 until 20).map(_ =>
          ("click", new Timestamp((base + 10 * 900) * 1000L))))
        q.processAllAvailable()
        input.addData(rows(12 to 13))    // closes 11 (quiet) and spike 12
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
      // the batch oracle sees the in-order rows only — the late rows
      // were dropped by the stream's at-close freeze, so the two sides
      // must agree INCLUDING the second spike the late rows tried to
      // suppress
      val batch = graft.ops.Behavior.rateAnomaly(
          rows(0 to 13).toDF("event_type", "ts")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
      assert(batch.map(_._2) === Set(base + 10 * 900, base + 12 * 900))
      assert(streamed === batch)
      // and the first spike was scored against the pre-spike baseline
      val row = streamed.minBy(_._2)
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
