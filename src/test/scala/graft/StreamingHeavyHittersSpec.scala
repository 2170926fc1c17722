package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamingHeavyHitters

/** The streaming heavy-hitter twin's oracle is the MG GUARANTEE
  * against exact batch counts (summary CONTENT is merge-order-
  * dependent, so equality with the batch q140 summary is not the
  * contract — the guarantee is):
  *  - per (bucket, shard): ≤ capacity candidates, every candidate
  *    count ≤ its exact count (undercount-only), and every key with
  *    exact shard count > n_shard/capacity present;
  *  - per bucket globally: the shard-union contains every key with
  *    total count > n/capacity (the mergeable-summaries bound). */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val capacity = 4
  private val nShards = 2
  private val base = 1700006400L - (1700006400L % 900)

  /** bucket 0: "hot" × 30 plus 12 distinct cold keys (forces MG
    * eviction at capacity 4); bucket 1: "warm" × 5 plus 2 cold. */
  private def rows: Seq[(String, Timestamp)] = {
    def at(off: Long) = new Timestamp((base + off) * 1000L)
    val b0 = Seq.fill(30)("hot").zipWithIndex.map { case (k, i) =>
      (k, at(10 + i)) } ++
      (0 until 12).map(i => (s"cold$i", at(500 + i)))
    val b1 = Seq.fill(5)("warm").zipWithIndex.map { case (k, i) =>
      (k, at(900 + 10 + i)) } ++
      Seq(("x1", at(900 + 100)), ("x2", at(900 + 101)))
    b0 ++ b1
  }

  test("candidates satisfy the Misra-Gries guarantee vs exact counts") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Timestamp)](spark)
      val df = input.toDF().toDF("event_type", "ts")
      val name = s"hh_${System.nanoTime()}"
      val q = StreamingHeavyHitters.heavyHitters(df, capacity, nShards)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(rows)
        q.processAllAvailable()
        // watermark sentinel (lags a batch — two pushes, q126 pattern)
        input.addData(Seq(("zz", new Timestamp((base + 10 * 900) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq(("zz", new Timestamp((base + 10 * 900 + 1) * 1000L))))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      assert(got.nonEmpty, "no candidate rows emitted")

      // exact per-(bucket, shard, key) truth from the same rows
      def shard(k: String) = Math.floorMod(k.hashCode, nShards)
      def bucket(t: Timestamp) = Math.floorDiv(t.getTime / 1000L, 900L)
      val exact = rows.groupBy { case (k, t) => (bucket(t), shard(k), k) }
        .map { case (key, vs) => key -> vs.size.toLong }
      val shardRows = rows.groupBy { case (k, t) => (bucket(t), shard(k)) }
        .map { case (key, vs) => key -> vs.size.toLong }

      got.groupBy(c => (c._1, c._2)).foreach { case ((b, s), cs) =>
        assert(cs.length <= capacity, s"bucket $b shard $s over capacity")
        assert(cs.forall(_._5 === shardRows((b, s))),
          "n_shard_rows mismatch")
        cs.foreach { case (_, _, k, mg, _) =>
          assert(mg <= exact((b, s, k)),
            s"MG count $mg over exact for $k")
        }
        // the guarantee: every true per-shard heavy hitter is present
        val threshold = shardRows((b, s)).toDouble / capacity
        exact.collect { case ((bb, ss, k), n) if bb == b && ss == s &&
            n > threshold => k }
          .foreach { k =>
            assert(cs.exists(_._3 == k),
              s"missed per-shard heavy hitter $k in bucket $b shard $s")
          }
      }

      // merged-union guarantee: global HH (count > n_bucket/capacity)
      // appear in the union of shard candidates for their bucket
      val byBucket = rows.groupBy { case (k, t) => bucket(t) }
      byBucket.foreach { case (b, vs) =>
        if (got.exists(_._1 == b)) {
          val n = vs.size.toDouble
          vs.groupBy(_._1).collect {
            case (k, ks) if ks.size > n / capacity => k
          }.foreach { k =>
            assert(got.exists(c => c._1 == b && c._3 == k),
              s"missed global heavy hitter $k in bucket $b")
          }
        }
      }
      // and the planted hitters specifically
      assert(got.exists(c => c._1 == base / 900 && c._3 == "hot"))
      assert(got.exists(c => c._1 == base / 900 + 1 && c._3 == "warm"))
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("late rows below the closed frontier are dropped, not re-emitted") {
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Timestamp)](spark)
      val df = input.toDF().toDF("event_type", "ts")
      val name = s"hh_late_${System.nanoTime()}"
      // no watermark delay shenanigans: close bucket 0 via sentinel,
      // then send a late row for it — no second bucket-0 row may appear
      val q = StreamingHeavyHitters.heavyHitters(df, capacity, nShards,
          delay = "0 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(Seq(("hot", new Timestamp((base + 10) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq(("zz", new Timestamp((base + 5 * 900) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq(("zz", new Timestamp((base + 5 * 900 + 1) * 1000L))))
        q.processAllAvailable()
        val afterClose = spark.table(name)
          .filter(s"bucket = ${base / 900}").count()
        assert(afterClose === 1L, "bucket 0 should have emitted once")
        input.addData(Seq(("hot", new Timestamp((base + 20) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq(("zz", new Timestamp((base + 6 * 900) * 1000L))))
        q.processAllAvailable()
        input.addData(Seq(("zz", new Timestamp((base + 6 * 900 + 1) * 1000L))))
        q.processAllAvailable()
        val afterLate = spark.table(name)
          .filter(s"bucket = ${base / 900}").count()
        assert(afterLate === 1L, "late row re-opened a closed bucket")
      } finally q.stop()
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
