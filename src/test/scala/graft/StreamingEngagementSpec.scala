package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamingEngagement

/** The streaming engagement twin's oracle is the batch pair: an
  * in-order replay must reproduce `rollingActiveUsers` exactly at
  * sub-sparse cardinalities (HLL is exact there) and
  * `rollingActiveUsersSketch`'s estimates register-for-register (same
  * DataSketches library, lgK, and update path). */
class StreamingEngagementSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700006400L - (1700006400L % 86400) // day-aligned

  /** users 1,2 active day 0; user 2 again day 1; user 3 day 30 (days
    * 0 AND 1 both aged out of day 30's MAU-28 window — a day-d
    * activity covers targets d..d+27, so day 1 reaches only day 28). */
  private def rows: Seq[(Long, Timestamp)] = Seq(
    (1L, new Timestamp((base + 3600) * 1000L)),
    (2L, new Timestamp((base + 7200) * 1000L)),
    (2L, new Timestamp((base + 86400 + 3600) * 1000L)),
    (3L, new Timestamp((base + 30L * 86400 + 3600) * 1000L)))

  test("in-order replay reproduces both batch engagement forms") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp)](spark)
      val df = input.toDF().toDF("user_id", "ts")
      val name = s"engagement_${System.nanoTime()}"
      val q = StreamingEngagement.engagement(df)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(rows)
        q.processAllAvailable()
        // sentinel advances the watermark past every real day's end;
        // the second batch evaluates the timers against it (watermark
        // lags a batch); the sentinel's own days stay open → absent
        input.addData(Seq((999L,
          new Timestamp((base + 100L * 86400) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq((999L,
          new Timestamp((base + 100L * 86400 + 1) * 1000L))))
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.table(name).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

      val batchDf = rows.toDF("user_id", "ts")
      val exact = graft.ops.Behavior.rollingActiveUsers(batchDf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // tiny cardinalities sit in HLL's exact (sparse) regime, so the
      // streamed estimates equal the exact counts outright
      assert(streamed === exact)
      val d0 = base / 86400
      assert(streamed(d0) === ((2L, 2L)))          // users 1,2
      assert(streamed(d0 + 1) === ((1L, 2L)))      // user 2; MAU {1,2}
      assert(streamed(d0 + 30) === ((1L, 1L)))     // user 3 alone
      // and the sketch batch form agrees estimate-for-estimate
      val sk = graft.ops.Behavior.rollingActiveUsersSketch(batchDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      streamed.foreach { case (day, (_, mau)) =>
        assert(sk(day) === mau, s"day $day sketch ${sk(day)} vs $mau")
      }
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
